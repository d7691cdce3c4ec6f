"""Prototype: k chunks per jit call to amortize the dispatch floor.

Motivation (TPU stage profile 2026-08-19): the rows/classes/scan stops
all measure ~33.5 ms/chunk — the dispatch+fetch floor, not compute — and
6 async dispatches cost exactly 6x the floor, so the floor does NOT
overlap across calls on the tunnel. Wrapping k identical-shape chunks in
ONE program (lax.map over the stacked chunk axis) divides the floor by k
without recompiling the body per chunk.

Measures the per-chunk wall cost of the "classes" stop (trivial compute:
isolates the floor) and the full pipeline at k in {1, 2, 4, 8}.

Usage: python scripts/prototype_megadispatch.py [MB] [K] [C] [stop]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MB = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
K = int(sys.argv[2]) if len(sys.argv) > 2 else 176
C = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
STOP = sys.argv[4] if len(sys.argv) > 4 else "classes"


def main():
    os.environ.setdefault("BENCH_CORPUS_MB", str(max(4, int(MB))))
    from bench import get_vocab_and_corpus

    import numpy as np

    import tiktoken_tpu
    import tiktoken_tpu_ext.openai_public as pub
    from tiktoken_tpu.ops import pipeline3 as p3

    ranks, corpus = get_vocab_and_corpus()
    enc = tiktoken_tpu.Encoding(
        "proto_mega", pat_str=pub.o200k_pat_str, mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )
    engine = enc.device_engine

    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}  K={K} C={C} stop={STOP}",
          file=sys.stderr, flush=True)

    n = int(MB * 1_000_000)
    docs = []
    for i in range(0, min(len(corpus), n), 1_000_000):
        d = corpus[i : i + 1_000_000]
        while d and d[-1] & 0xC0 == 0x80:
            d = d[:-1]
        docs.append(d)

    pc = p3.pack_corpus3(docs, K)
    KP, KL = p3.row_geometry(K)
    B = pc.row_off.shape[0]
    R = C - 1
    S = -(-(C * KP + KL + 8) // 128) * 128
    los = list(range(0, B, R))
    tables = engine._tables2()
    chunks = [p3.chunk_inputs3(pc, lo, R, C, S)[0] for lo in los]
    payload = sum(float(np.sum(ch[2])) for ch in chunks) / 1e6
    kw = dict(
        K=K, C=C, flat_size=S, char_tables=engine.char_tables,
        pair_seed=engine.pair_table.seed,
        pair_buckets=engine.pair_table.n_buckets,
        vocab_seed=engine.vocab_table.seed,
        vocab_buckets=engine.vocab_table.n_buckets,
        long_seed=engine.long_vocab_table.seed,
        long_buckets=engine.long_vocab_table.n_buckets,
        pack24=engine.pack24,
        stage_stop=None if STOP == "full" else STOP,
    )
    body = p3.build_pipeline3_fn(**kw)
    targs = (tables["scan2"], tables["buckets"], tables["byte_to_rank"],
             tables["vocab"])

    for k in (1, 2, 4, 8):
        groups = []
        for g in range(0, len(chunks) - k + 1, k):
            stacked = tuple(
                jax.device_put(np.stack([chunks[g + j][i] for j in range(k)]))
                for i in range(7)
            )
            groups.append(stacked)
        if not groups:
            continue

        @jax.jit
        def mega(s2, bk, br, vr, *stacked):
            return jax.lax.map(lambda ch: body(s2, bk, br, vr, *ch), stacked)

        t0 = time.perf_counter()
        out = mega(*targs, *groups[0])
        np.asarray(out[1])
        compile_s = time.perf_counter() - t0

        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [mega(*targs, *g) for g in groups]
            _ = [np.asarray(o[1][:, -2:]) for o in outs]
            best = min(best, time.perf_counter() - t0)
        n_chunks = k * len(groups)
        mb = payload * n_chunks / len(chunks)
        print(
            f"k={k}: {best*1e3:8.1f} ms total ({mb/best:7.1f} MB/s)"
            f"  [{best*1e3/n_chunks:6.1f} ms/chunk over {n_chunks}]"
            f"  compile {compile_s:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
