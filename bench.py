"""Benchmark: o200k-pattern BPE encode throughput on one chip.

Prints ONE json line:
    {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

vs_baseline is measured against the reference library's own single-thread
throughput on this machine's CPU with the identical vocabulary and
pattern (the reference's published numbers, BASELINE.md, were ~6.4 MB/s
single-thread / ~38 MB/s peak on unspecified hardware).

Offline-safe: the real o200k_base vocab cannot be downloaded in this
environment, so a same-scale vocabulary is trained locally (cached) with
the real o200k split pattern; the reference library is given the same
vocab, so the comparison is apples-to-apples and byte-exact parity is
asserted on every run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS_MB = float(os.environ.get("BENCH_CORPUS_MB", "64"))
VOCAB_SIZE = int(os.environ.get("BENCH_VOCAB", "100000"))
ROW = int(os.environ.get("BENCH_ROW", "2048"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_bench_corpus(n_chars: int, seed: int) -> str:
    """Natural-text-like synthetic corpus with enough lexical diversity to
    support a ~100k-rank vocabulary: a 60k-word syllable lexicon sampled
    zipf-ish, mixed with digits, punctuation, multi-script words, and
    varied whitespace (word frequencies and shapes roughly mirror real
    prose, so merge behaviour and piece-length stats are realistic)."""
    import random

    rng = random.Random(seed)
    onsets = ["b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p",
              "r", "s", "t", "v", "w", "z", "ch", "sh", "th", "st", "tr",
              "pl", "br", "gr", "sp", ""]
    vowels = ["a", "e", "i", "o", "u", "ai", "ee", "ou", "io", "ea"]
    codas = ["", "", "n", "r", "s", "t", "l", "m", "ng", "ck", "st", "rd"]

    lex_rng = random.Random(1234)
    lexicon = []
    seen = set()
    while len(lexicon) < 60_000:
        w = "".join(
            lex_rng.choice(onsets) + lex_rng.choice(vowels) + lex_rng.choice(codas)
            for _ in range(lex_rng.randrange(1, 4))
        )
        if w and w not in seen:
            seen.add(w)
            lexicon.append(w)

    uni = ("naïve café jalapeño Zürich Москва привет мир 東京 こんにちは 世界 "
           "你好 北京 مرحبا שלום Ελληνικά κόσμος हिन्दी 한국어").split()
    punct = [".", ",", "!", "?", ";", ":", "(", ")", "\"", "'", "...", "-", "/"]
    ws = [" "] * 12 + ["\n", "\n\n", "\r\n", "\t", "  "]

    out: list[str] = []
    size = 0
    while size < n_chars:
        r = rng.random()
        if r < 0.80:
            # zipf-ish: rank ~ floor(exp(u*ln(V)))
            rank = int(len(lexicon) ** rng.random()) - 1
            tok = lexicon[rank]
            if rng.random() < 0.12:
                tok = tok.capitalize()
        elif r < 0.86:
            tok = str(rng.randrange(10 ** rng.randrange(1, 7)))
        elif r < 0.92:
            tok = rng.choice(punct)
        elif r < 0.95:
            tok = rng.choice(uni)
        else:
            tok = rng.choice(ws)
            out.append(tok)
            size += len(tok)
            continue
        sep = rng.choice(ws)
        out.append(tok)
        out.append(sep)
        size += len(tok) + len(sep)
    return "".join(out)


def get_vocab_and_corpus():
    from tiktoken_tpu.load import dump_tiktoken_bpe, load_tiktoken_bpe
    from tiktoken_tpu.ops.artifacts import _artifact_dir
    import tiktoken_tpu_ext.openai_public as pub

    cache_dir = _artifact_dir() or "/tmp/tiktoken-tpu-compiled"
    os.makedirs(cache_dir, exist_ok=True)
    vocab_path = os.path.join(cache_dir, f"bench_vocab2_{VOCAB_SIZE}.tiktoken")
    if os.path.exists(vocab_path):
        log(f"loading cached bench vocab {vocab_path}")
        ranks = load_tiktoken_bpe(vocab_path)
    else:
        log(f"training {VOCAB_SIZE}-rank vocab on bench corpus (one-time)...")
        from tiktoken_tpu.train import train_bpe

        t0 = time.time()
        ranks = train_bpe(
            [make_bench_corpus(24_000_000, seed=1)], VOCAB_SIZE, pub.o200k_pat_str,
            min_pair_count=2,
        )
        log(f"trained {len(ranks)} ranks in {time.time()-t0:.0f}s")
        dump_tiktoken_bpe(ranks, vocab_path)

    n = int(CORPUS_MB * 1_000_000)
    log(f"building {CORPUS_MB} MB corpus...")
    chunk = make_bench_corpus(2_000_000, seed=7)
    reps = max(1, n // len(chunk.encode())) + 1
    corpus = (chunk * reps).encode()[:n]
    # ensure valid utf-8 at the cut
    while corpus[-1] & 0xC0 == 0x80:
        corpus = corpus[:-1]
    return ranks, corpus


def probe_native_backend(timeout_s: float = 240.0) -> bool:
    """True if the native (TPU) backend initializes in a fresh
    subprocess within the timeout. The axon tunnel can be down for
    hours, in which case jax.devices() HANGS rather than raising — a
    direct call here would turn the whole benchmark into a timeout.
    Probing in a child process keeps this process clean; on failure the
    bench falls back to the CPU backend and says so in the JSON."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d=jax.devices(); print(d[0].platform)"],
            capture_output=True, timeout=timeout_s, text=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    import numpy as np

    import tiktoken_tpu
    import tiktoken_tpu_ext.openai_public as pub

    ranks, corpus = get_vocab_and_corpus()

    log("probing native backend...")
    native_ok = probe_native_backend()
    import jax

    if not native_ok:
        log("NATIVE BACKEND UNAVAILABLE (tunnel down?) — CPU fallback")
        jax.config.update("jax_platforms", "cpu")
    platform = "tpu" if native_ok else "cpu-fallback"
    log(f"devices: {jax.devices()}")

    enc = tiktoken_tpu.Encoding(
        "bench_o200k",
        pat_str=pub.o200k_pat_str,
        mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )

    # split the corpus into documents like scripts/benchmark.py would
    docs = []
    step = 1_000_000
    for i in range(0, len(corpus), step):
        d = corpus[i : i + step]
        while d and d[-1] & 0xC0 == 0x80:
            d = d[:-1]
        docs.append(d.decode("utf-8", errors="ignore"))
    total_bytes = sum(len(d.encode()) for d in docs)

    engine = enc.device_engine
    log(f"dfa states={engine.dfa.n_states}, "
        f"pair table={engine.pair_table.n_pairs} pairs, "
        f"buckets={engine.pair_table.n_buckets}")

    # warmup (compile the device chunk shape + build the native core);
    # worst_case=True also pre-compiles the cap-overflow retry variant so
    # a rare dense chunk can never inject a multi-minute compile into a
    # timed section. In cpu-fallback mode the device strategy is skipped
    # outright: compiling the production chunk geometry on XLA:CPU takes
    # tens of minutes (the round-2 multichip-gate lesson) and a CPU
    # "device path" number would not describe the TPU anyway.
    import statistics

    log("warmup/compile...")
    if native_ok:
        enc.warmup(worst_case=True)
        _ = enc.encode_corpus(docs[:2], strategy="device")
    _ = enc.encode_corpus(docs[:1], strategy="host")

    # every configuration: median of 3 runs over the IDENTICAL full
    # corpus (a best-of on a sub-sample is neither reproducible nor
    # comparable run-to-run)
    # Only the parity-sample documents' tokens are retained from each
    # run: keeping a full 64 MB corpus's list[list[int]] alive across
    # rows (~15M tracked PyLongs per result) makes every later gen2 GC
    # collection scan them, measured as a ~3x slowdown of later
    # list-output rows. perf_counter brackets exclude the del/collect.
    import gc

    sample_idx = list(range(0, len(docs), max(1, len(docs) // 8)))

    def timed(strategy: str, n: int = 3, numpy_out: bool = False):
        rates, sampled = [], None
        for _ in range(n):
            gc.collect()
            t0 = time.perf_counter_ns()
            if numpy_out:
                result = enc.encode_corpus_to_numpy(docs, strategy=strategy)
            else:
                result = enc.encode_corpus(docs, strategy=strategy)
            t1 = time.perf_counter_ns()
            rates.append(total_bytes / ((t1 - t0) / 1e9) / 1e6)
            sampled = {i: result[i] for i in sample_idx}
            del result
        return statistics.median(rates), sampled

    device_only_mbs = 0.0
    if native_ok:
        log("timing device-only encode_corpus (median of 3)...")
        device_only_mbs, device_only_tokens = timed("device")
        log(f"device-only: {device_only_mbs:.2f} MB/s")

    log("timing host-only encode_corpus (median of 3)...")
    host_mbs, _r = timed("host")
    log(f"host-only: {host_mbs:.2f} MB/s")

    log("timing host encode_corpus_to_numpy (median of 3)...")
    host_numpy_mbs, _r = timed("host", numpy_out=True)
    log(f"host-numpy: {host_numpy_mbs:.2f} MB/s")

    strategy = enc.resolve_corpus_strategy("auto" if native_ok else "host")
    log(f"timing encode_corpus (auto -> {strategy}, median of 3)...")
    device_mbs, device_tokens = timed(strategy)

    log(f"timing encode_corpus_to_numpy (auto -> {strategy}, median of 3)...")
    numpy_mbs, _r = timed(strategy, numpy_out=True)
    log(f"auto-numpy: {numpy_mbs:.2f} MB/s")
    if strategy == "host" and native_ok:
        # the auto policy keeps a 1-core host off hybrid; record the
        # hybrid numbers anyway so the policy stays auditable
        log("timing hybrid rows (median of 3, for the record)...")
        hybrid_mbs, _r = timed("hybrid")
        hybrid_numpy_mbs, _r = timed("hybrid", numpy_out=True)
        log(f"hybrid: {hybrid_mbs:.2f} | hybrid-numpy: {hybrid_numpy_mbs:.2f}")
    else:
        hybrid_mbs, hybrid_numpy_mbs = device_mbs, numpy_mbs

    # parity spot check vs the reference library on a sample
    import tiktoken

    oracle = tiktoken.Encoding(
        "bench_oracle", pat_str=pub.o200k_pat_str, mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )
    parity = all(
        list(device_tokens[i]) == oracle.encode_ordinary(docs[i])
        for i in sample_idx
    )
    if native_ok:
        # the device pipeline must stay byte-exact even when auto
        # resolves to a host strategy
        parity = parity and all(
            list(device_only_tokens[i]) == oracle.encode_ordinary(docs[i])
            for i in sample_idx
        )
    log(f"parity vs reference: {parity}")

    # reference baselines on the same host and the IDENTICAL corpus,
    # median of 3 like every row above: single-thread, its best
    # multi-threaded configuration (published peak ~16 threads,
    # BASELINE.md; capped at this box's core count), and its fastest
    # array-output configuration (per-doc encode_to_numpy, zero-copy
    # buffer protocol, in the same thread pool) — the reference's
    # analog of encode_corpus_to_numpy, so the headline compares
    # best-faith config to best-faith config.
    def ref_timed(fn, n: int = 3):
        rates = []
        for _ in range(n):
            t0 = time.perf_counter_ns()
            fn()
            t1 = time.perf_counter_ns()
            rates.append(total_bytes / ((t1 - t0) / 1e9) / 1e6)
        return statistics.median(rates)

    n_thr = min(8, os.cpu_count() or 8)
    _ = oracle.encode_ordinary_batch(docs[:1], num_threads=1)  # warm
    ref_mbs = ref_timed(
        lambda: oracle.encode_ordinary_batch(docs, num_threads=1)
    )
    ref8_mbs = ref_timed(
        lambda: oracle.encode_ordinary_batch(docs, num_threads=n_thr)
    )
    from concurrent.futures import ThreadPoolExecutor

    def ref_numpy_batch():
        with ThreadPoolExecutor(n_thr) as pool:
            return list(pool.map(oracle.encode_to_numpy, docs))

    ref_numpy_mbs = ref_timed(ref_numpy_batch)
    ref_best = max(ref_mbs, ref8_mbs, ref_numpy_mbs)
    log(
        f"node: {numpy_mbs:.1f} MB/s | device-only: {device_only_mbs:.1f}"
        f" | reference 1-thread: {ref_mbs:.1f} | {n_thr}-thread: {ref8_mbs:.1f}"
        f" | ref-numpy: {ref_numpy_mbs:.1f}"
    )

    if not parity:
        # a wrong tokenizer has no throughput
        device_mbs = device_only_mbs = numpy_mbs = 0.0

    # The headline is the fastest faithful corpus configuration under
    # auto scheduling (array output — the corpus-scale analog of the
    # reference's encode_to_numpy); vs_baseline is measured against the
    # STRONGEST reference configuration on this host, not its
    # single-thread floor.
    print(
        json.dumps(
            {
                "metric": "o200k-pattern corpus encode to uint32 arrays, byte-exact (auto scheduling)",
                "value": round(numpy_mbs, 2),
                "unit": "MB/s",
                "vs_baseline": round(numpy_mbs / max(ref_best, 1e-9), 2),
                "list_out": round(device_mbs, 2),
                "device_only": round(device_only_mbs, 2),
                "host_only": round(host_mbs, 2),
                "host_numpy": round(host_numpy_mbs, 2),
                "hybrid": round(hybrid_mbs, 2),
                "hybrid_numpy": round(hybrid_numpy_mbs, 2),
                "ref_1thread": round(ref_mbs, 2),
                "ref_8thread": round(ref8_mbs, 2),
                "ref_numpy": round(ref_numpy_mbs, 2),
                "vs_ref_1thread": round(numpy_mbs / max(ref_mbs, 1e-9), 2),
                "platform": platform,
                "resolved_strategy": strategy,
                "corpus_mb": round(total_bytes / 1e6, 1),
                "timing": "median of 3, identical full corpus for all rows",
            }
        )
    )


if __name__ == "__main__":
    main()
