"""Decompose the v3 device path end-to-end cost on real hardware.

Times, separately, for one corpus at one geometry:
  pack      — host-side pack_corpus3 (cuts + offsets)
  upload    — host->device transfer of every chunk's inputs
  compute   — dispatches of the compiled pipeline on PRE-UPLOADED inputs
              (the pure device-compute rate; one scalar fetch per chunk
              blocks on completion)
  fetch     — device->host of packed tokens + headers, and unpack
  e2e       — engine.encode_corpus3 (the production overlap of all four)

Usage: python scripts/profile_dispatch.py [MB] [K] [C]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MB = float(sys.argv[1]) if len(sys.argv) > 1 else 24.0
K = int(sys.argv[2]) if len(sys.argv) > 2 else 176
C = int(sys.argv[3]) if len(sys.argv) > 3 else 8192


def main():
    os.environ.setdefault("BENCH_CORPUS_MB", str(max(4, int(MB))))
    from bench import get_vocab_and_corpus

    import numpy as np

    import tiktoken_tpu
    import tiktoken_tpu_ext.openai_public as pub
    from tiktoken_tpu.ops import pipeline3 as p3

    ranks, corpus = get_vocab_and_corpus()
    enc = tiktoken_tpu.Encoding(
        "prof_dispatch", pat_str=pub.o200k_pat_str, mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )
    engine = enc.device_engine

    import jax

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    n = int(MB * 1_000_000)
    docs = []
    for i in range(0, min(len(corpus), n), 1_000_000):
        d = corpus[i : i + 1_000_000]
        while d and d[-1] & 0xC0 == 0x80:
            d = d[:-1]
        docs.append(d)
    total = sum(len(d) for d in docs)
    print(f"corpus: {total/1e6:.1f} MB  K={K} C={C}", file=sys.stderr, flush=True)

    def mbs(t):
        return total / t / 1e6 if t > 0 else float("inf")

    # ---- pack ----------------------------------------------------------
    t0 = time.perf_counter()
    pc = p3.pack_corpus3(docs, K)
    t_pack = time.perf_counter() - t0
    print(f"pack    : {t_pack*1e3:8.1f} ms ({mbs(t_pack):8.1f} MB/s)", flush=True)

    KP, KL = p3.row_geometry(K)
    B = pc.row_off.shape[0]
    R = C - 1
    S = -(-(C * KP + KL + 8) // 128) * 128
    los = list(range(0, B, R))
    print(f"rows={B} chunks={len(los)}", file=sys.stderr, flush=True)

    # compile (untimed)
    t0 = time.perf_counter()
    engine.warmup(K=K, chunk_rows=C)
    print(f"compile : {time.perf_counter()-t0:8.1f} s", flush=True)
    fn = engine._pipeline3(C, K)
    tables = engine._tables2()

    chunk_list = [p3.chunk_inputs3(pc, lo, R, C, S) for lo in los]

    # ---- upload (sequential, then measure what e2e threads hide) -------
    t0 = time.perf_counter()
    dev_inputs = []
    for inputs, nreal in chunk_list:
        dev_inputs.append(
            (tuple(jax.device_put(x) for x in inputs), nreal)
        )
    for di, _ in dev_inputs:
        for x in di:
            x.block_until_ready()
    t_upload = time.perf_counter() - t0
    print(f"upload  : {t_upload*1e3:8.1f} ms ({mbs(t_upload):8.1f} MB/s)", flush=True)

    # ---- compute (pre-uploaded inputs; scalar fetch blocks per chunk) --
    for rep in range(2):
        t0 = time.perf_counter()
        outs = []
        for di, nreal in dev_inputs:
            tok, header = fn(
                tables["scan2"], tables["buckets"], tables["byte_to_rank"],
                tables["vocab"], *di,
            )
            outs.append((tok, header))
        # block on completion: fetch each header (small)
        hdrs = [np.asarray(h) for _, h in outs]
        t_comp = time.perf_counter() - t0
        print(
            f"compute : {t_comp*1e3:8.1f} ms ({mbs(t_comp):8.1f} MB/s)"
            f"  [{t_comp*1e3/len(los):6.1f} ms/chunk]",
            flush=True,
        )

    # ---- fetch (packed tokens) -----------------------------------------
    t0 = time.perf_counter()
    ntok = 0
    for (tok, _h), hdr in zip(outs, hdrs):
        nt = int(hdr[-2])
        ntok += nt
        if nt:
            words = (3 * nt + 3) // 4 if engine.pack24 else nt
            size = min(int(tok.shape[0]), 1 << max(0, (words - 1)).bit_length())
            _ = np.asarray(engine._fetch_sliced(tok, size))
    t_fetch = time.perf_counter() - t0
    print(
        f"fetch   : {t_fetch*1e3:8.1f} ms ({mbs(t_fetch):8.1f} MB/s)"
        f"  [{ntok} tokens]",
        flush=True,
    )

    # ---- end-to-end production path ------------------------------------
    for rep in range(2):
        t0 = time.perf_counter()
        got = engine.encode_corpus3(docs, host_fallback=enc, K=K, chunk_rows=C)
        t_e2e = time.perf_counter() - t0
        print(f"e2e     : {t_e2e*1e3:8.1f} ms ({mbs(t_e2e):8.1f} MB/s)", flush=True)

    sample = docs[0].decode("utf-8", errors="ignore")
    assert got[0] == enc.encode_ordinary(sample), "parity"
    print("parity ok", flush=True)


if __name__ == "__main__":
    main()
