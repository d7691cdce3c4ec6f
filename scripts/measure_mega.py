"""Measure mega-dispatch end-to-end on the TPU with per-stage timing.

Runs device-only encode_corpus over a BENCH_CORPUS_MB corpus for each
TIKTOKEN_TPU_MEGA in MEGAS, printing MB/s and the engine.timing stage
split (pack / dispatch / header fetch / token fetch / assembly).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("BENCH_CORPUS_MB", "16")

MEGAS = [int(x) for x in (sys.argv[1:] or ["1", "4", "8"])]


def main() -> None:
    import bench
    import tiktoken_tpu
    import tiktoken_tpu_ext.openai_public as pub

    ranks, corpus = bench.get_vocab_and_corpus()
    docs = []
    step = 1_000_000
    for i in range(0, len(corpus), step):
        d = corpus[i : i + step]
        while d and d[-1] & 0xC0 == 0x80:
            d = d[:-1]
        docs.append(d.decode("utf-8", errors="ignore"))
    total = sum(len(d.encode()) for d in docs)

    import jax

    print(f"devices: {jax.devices()}", flush=True)

    enc = tiktoken_tpu.Encoding(
        "bench_o200k",
        pat_str=pub.o200k_pat_str,
        mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )
    eng = enc.device_engine

    for m in MEGAS:
        os.environ["TIKTOKEN_TPU_MEGA"] = str(m)
        t0 = time.perf_counter()
        enc.warmup()
        print(f"m={m}: warmup {time.perf_counter()-t0:.1f}s", flush=True)
        rates = []
        for rep in range(3):
            t0 = time.perf_counter()
            out = enc.encode_corpus(docs, strategy="device")
            dt = time.perf_counter() - t0
            rates.append(total / dt / 1e6)
            stages = " ".join(f"{k}={v*1e3:.0f}ms" for k, v in eng.timing.items())
            print(f"m={m} rep{rep}: {total/dt/1e6:.2f} MB/s | {stages}",
                  flush=True)
        print(f"m={m}: median {sorted(rates)[1]:.2f} MB/s  "
              f"fallback_docs={eng.stats['fallback_docs']}", flush=True)
        del out


if __name__ == "__main__":
    main()
