"""Sweep device-pipeline tuning knobs on the TPU at fixed geometry.

For each env-knob combo, builds the FULL v3 pipeline fresh (knobs are
read at build time), compiles (persistent executable cache makes
repeats cheap), and times it over pre-uploaded chunks of a bench
corpus. Prints one line per combo; parity is asserted on the first
chunk of the first combo vs the host oracle.

Usage: python scripts/sweep_knobs.py [MB] [K] [C]
Combos come from the COMBOS table below; edit freely between runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MB = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
K = int(sys.argv[2]) if len(sys.argv) > 2 else 176
C = int(sys.argv[3]) if len(sys.argv) > 3 else 8192

COMBOS: list[dict[str, str]] = [
    {},  # baseline
    {"TIKTOKEN_TPU_MERGE_PHASE1": "4"},
    {"TIKTOKEN_TPU_MERGE_PHASE1": "2"},
    {"TIKTOKEN_TPU_MERGE_PHASE1": "4", "TIKTOKEN_TPU_MERGE_POOL_DIV": "8"},
    {"TIKTOKEN_TPU_MCAP_DIV": "96"},
    {"TIKTOKEN_TPU_MCAP_DIV": "96", "TIKTOKEN_TPU_MERGE_PHASE1": "4"},
    {"TIKTOKEN_TPU_MERGE16_UNROLL": "16"},
    {"TIKTOKEN_TPU_MERGE16_UNROLL": "4"},
]

_KNOB_KEYS = sorted({k for c in COMBOS for k in c})


def main():
    os.environ.setdefault("BENCH_CORPUS_MB", str(max(4, int(MB))))
    from bench import get_vocab_and_corpus

    import numpy as np

    import tiktoken_tpu
    import tiktoken_tpu_ext.openai_public as pub
    from tiktoken_tpu.ops import pipeline3 as p3

    ranks, corpus = get_vocab_and_corpus()
    enc = tiktoken_tpu.Encoding(
        "sweep", pat_str=pub.o200k_pat_str, mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )
    engine = enc.device_engine

    import jax

    print(f"device: {jax.devices()[0]}  K={K} C={C}", flush=True)

    n = int(MB * 1_000_000)
    docs = []
    for i in range(0, min(len(corpus), n), 1_000_000):
        d = corpus[i : i + 1_000_000]
        while d and d[-1] & 0xC0 == 0x80:
            d = d[:-1]
        docs.append(d)
    total = sum(len(d) for d in docs)

    pc = p3.pack_corpus3(docs, K)
    KP, KL = p3.row_geometry(K)
    B = pc.row_off.shape[0]
    R = C - 1
    S = -(-(C * KP + KL + 8) // 128) * 128
    los = list(range(0, B, R))
    tables = engine._tables2()
    chunk_list = [p3.chunk_inputs3(pc, lo, R, C, S) for lo in los]
    dev_inputs = [
        tuple(jax.device_put(x) for x in inputs) for inputs, _ in chunk_list
    ]
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
    targs = (tables["scan2"], tables["buckets"], tables["byte_to_rank"],
             tables["vocab"])

    for combo in COMBOS:
        for k in _KNOB_KEYS:
            os.environ.pop(k, None)
        os.environ.update(combo)
        label = ",".join(f"{k.split('_TPU_')[1]}={v}" for k, v in combo.items()) or "baseline"
        t0 = time.perf_counter()
        fn = jax.jit(p3.build_pipeline3_fn(**kw))
        out = fn(*targs, *dev_inputs[0])
        hdr0 = np.asarray(out[1])
        compile_s = time.perf_counter() - t0
        assert not hdr0[-1], f"{label}: cap overflow on chunk 0"
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(*targs, *di) for di in dev_inputs]
            _ = [np.asarray(o[1][-2:]) for o in outs]
            best = min(best, time.perf_counter() - t0)
        ms_chunk = best * 1e3 / len(dev_inputs)
        print(
            f"{label:48s}: {best*1e3:7.1f} ms ({total/best/1e6:6.1f} MB/s)"
            f" [{ms_chunk:6.1f} ms/chunk] compile {compile_s:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
