"""Sweep the v3 chunk geometry (K payload bytes/row x C rows/chunk) on
the real chip and report device-only MB/s per geometry (ROADMAP lever 5:
larger chunks amortize the per-dispatch and per-loop-iteration floors at
the price of compile time).

Each geometry compiles one program; run on a QUIET machine and expect
minutes of compile per point on the axon backend. Results append to
stdout as JSON lines so a killed sweep keeps its finished points.

Usage: python scripts/bench_geometry.py [MB] [K,K,...] [C,C,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MB = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
KS = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [176, 256]
CS = [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 else [8192, 16384]


def main():
    os.environ.setdefault("BENCH_CORPUS_MB", str(max(4, int(MB))))
    from bench import get_vocab_and_corpus

    import tiktoken_tpu
    import tiktoken_tpu_ext.openai_public as pub

    ranks, corpus = get_vocab_and_corpus()
    enc = tiktoken_tpu.Encoding(
        "geom", pat_str=pub.o200k_pat_str, mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )
    docs = []
    step = 1_000_000
    n = int(MB * 1_000_000)
    for i in range(0, min(len(corpus), n), step):
        d = corpus[i : i + step]
        while d and d[-1] & 0xC0 == 0x80:
            d = d[:-1]
        docs.append(d.decode("utf-8", errors="ignore"))
    total = sum(len(d.encode()) for d in docs)

    import jax

    print(f"device: {jax.devices()[0]}  corpus: {total/1e6:.1f} MB",
          file=sys.stderr, flush=True)
    want = None
    for K in KS:
        for C in CS:
            t0 = time.time()
            try:
                enc.device_engine.warmup(K=K, chunk_rows=C)
            except Exception as e:  # compile blowup / OOM: record and move on
                print(json.dumps({"K": K, "C": C, "error": repr(e)[:200]}),
                      flush=True)
                continue
            compile_s = time.time() - t0
            best = 0.0
            for _ in range(2):
                t0 = time.perf_counter_ns()
                got = enc.device_engine.encode_corpus3(
                    docs, host_fallback=enc, K=K, chunk_rows=C
                )
                t1 = time.perf_counter_ns()
                best = max(best, total / ((t1 - t0) / 1e9) / 1e6)
            if want is None:
                want = [enc.encode_ordinary(d) for d in docs]
            stats = dict(enc.device_engine.stats)
            print(
                json.dumps(
                    {
                        "K": K, "C": C, "mbs": round(best, 2),
                        "compile_s": round(compile_s, 1),
                        "parity": got == want,
                        "fallback_docs": stats.get("fallback_docs", 0),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
