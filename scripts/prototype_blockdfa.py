"""Decide the block-composed-DFA question with numbers (ROADMAP lever).

Block composition runs the scanner's transition machinery over
(n_blocks x k) lanes instead of chaining one lane per row: it pays k
TIMES the per-byte transition work to cut the sequential depth from
row-length to 128. It can only win if the select-sweep's
lane-transitions/s keeps scaling with lane count (i.e. today's scan is
bound by per-step fixed cost, not element throughput).

This measures exactly that: the scan stage's cost (scan-stop minus
classes-stop, same chunk) at C in {2048, 8192, 32768} lanes. If MB/s is
flat in C, the transition machinery is throughput-bound and block
composition at k lanes/byte is a strict ~k-fold loss; if MB/s grows
with C, the residual fixed-cost fraction bounds the possible win.

Usage: python scripts/prototype_blockdfa.py [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(sys.argv[1]) if len(sys.argv) > 1 else 176
CS = [2048, 8192, 32768]


def main():
    os.environ.setdefault("BENCH_CORPUS_MB", "16")
    from bench import get_vocab_and_corpus

    import numpy as np

    import tiktoken_tpu
    import tiktoken_tpu_ext.openai_public as pub
    from tiktoken_tpu.ops import pipeline3 as p3

    ranks, corpus = get_vocab_and_corpus()
    enc = tiktoken_tpu.Encoding(
        "blockdfa", pat_str=pub.o200k_pat_str, mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )
    engine = enc.device_engine

    import jax

    print(f"device: {jax.devices()[0]}  K={K}", flush=True)

    docs = []
    for i in range(0, len(corpus), 1_000_000):
        d = corpus[i : i + 1_000_000]
        while d and d[-1] & 0xC0 == 0x80:
            d = d[:-1]
        docs.append(d)

    pc = p3.pack_corpus3(docs, K)
    KP, KL = p3.row_geometry(K)
    B = pc.row_off.shape[0]
    tables = engine._tables2()
    targs = (tables["scan2"], tables["buckets"], tables["byte_to_rank"],
             tables["vocab"])

    rates = {}
    for C in CS:
        R = C - 1
        S = -(-(C * KP + KL + 8) // 128) * 128
        n_chunks = max(1, B // R)  # full chunks only: constant payload
        chunks = [p3.chunk_inputs3(pc, lo * R, R, C, S)[0]
                  for lo in range(n_chunks)]
        payload = n_chunks * R * KP  # bytes scanned per pass
        dev = [tuple(jax.device_put(x) for x in ch) for ch in chunks]
        kw = dict(
            K=K, C=C, flat_size=S, char_tables=engine.char_tables,
            pair_seed=engine.pair_table.seed,
            pair_buckets=engine.pair_table.n_buckets,
            vocab_seed=engine.vocab_table.seed,
            vocab_buckets=engine.vocab_table.n_buckets,
            long_seed=engine.long_vocab_table.seed,
            long_buckets=engine.long_vocab_table.n_buckets,
            pack24=engine.pack24,
        )
        ms = {}
        for stop in ("classes", "scan"):
            fn = jax.jit(p3.build_pipeline3_fn(stage_stop=stop, **kw))
            out = fn(*targs, *dev[0])
            np.asarray(out[1])  # compile+run
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                outs = [fn(*targs, *d) for d in dev]
                _ = [np.asarray(o[1][-2:]) for o in outs]
                best = min(best, time.perf_counter() - t0)
            ms[stop] = best * 1e3
        scan_ms = ms["scan"] - ms["classes"]
        rate = payload / (scan_ms / 1e3) / 1e6 if scan_ms > 0 else float("inf")
        rates[C] = rate
        print(
            f"C={C:6d}: classes {ms['classes']:7.1f} ms, scan {ms['scan']:7.1f} ms"
            f" -> scan stage {scan_ms:7.1f} ms over {payload/1e6:.2f} MB"
            f" = {rate:7.1f} MB/s", flush=True,
        )

    lo, hi = rates[CS[0]], rates[CS[-1]]
    growth = hi / lo if lo else float("inf")
    print(
        f"\nscan-rate growth {CS[0]}->{CS[-1]} lanes: {growth:.2f}x. "
        "Block composition at k lanes/byte multiplies transition work by"
        " k; it wins only if rate keeps growing ~k-fold past today's"
        f" lane count. Verdict: {'worth prototyping' if growth > 2 else 'NEGATIVE — throughput-bound, k-fold extra work is a strict loss'}",
        flush=True,
    )


if __name__ == "__main__":
    main()
