"""Benchmark: o200k-pattern BPE encode throughput on one chip.

Prints ONE json line:
    {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

vs_baseline is measured against the reference library's own throughput on
this machine's CPU with the identical vocabulary and pattern (the
reference's published numbers, BASELINE.md, were ~6.4 MB/s single-thread /
~38 MB/s peak on unspecified hardware).

Offline-safe: the real o200k_base vocab cannot be downloaded in this
environment, so a same-scale vocabulary is trained locally (cached) with
the real o200k split pattern; the reference library is given the same
vocab, so the comparison is apples-to-apples and byte-exact parity is
asserted on every run.

Robustness: the TPU tunnel on this box can be down for hours, and a cold
executable cache makes the first device compile cost minutes. The bench
therefore (a) measures every host/reference row FIRST, in this process,
with no device contact; (b) runs the entire device section in a child
process under a hard deadline (BENCH_DEVICE_TIMEOUT_S, default 2100 s);
and (c) ALWAYS prints the final JSON line — a dead tunnel or a blown
compile budget degrades the device fields to 0 and the headline to the
host configuration instead of timing out the whole benchmark.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Persistent caches (trained bench vocab, scanner/vocab artifacts, XLA
# executables) live inside the repo: /tmp is wiped between sessions and a
# cold executable cache costs minutes of TPU compile time per program.
os.environ.setdefault("TIKTOKEN_TPU_CACHE_DIR", os.path.join(_REPO, ".cache"))

CORPUS_MB = float(os.environ.get("BENCH_CORPUS_MB", "64"))
VOCAB_SIZE = int(os.environ.get("BENCH_VOCAB", "100000"))
# budget for the device child: with a warm persistent executable cache the
# whole section takes ~10 min; cold it would need hours of tunnel compile
# time (HARDWARE.md), so the child is cut at this deadline and the bench
# reports host rows with device fields zeroed rather than timing out whole
DEVICE_TIMEOUT_S = float(os.environ.get("BENCH_DEVICE_TIMEOUT_S", "1200"))
REPS = int(os.environ.get("BENCH_REPS", "3"))


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


def get_vocab():
    from tiktoken_tpu.load import dump_tiktoken_bpe, load_tiktoken_bpe
    from tiktoken_tpu.ops.artifacts import _artifact_dir
    import tiktoken_tpu_ext.openai_public as pub

    committed = os.path.join(_REPO, "assets", f"bench_vocab2_{VOCAB_SIZE}.tiktoken")
    if os.path.exists(committed):
        log(f"loading committed bench vocab {committed}")
        return load_tiktoken_bpe(committed)
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
    return ranks


def get_corpus() -> bytes:
    n = int(CORPUS_MB * 1_000_000)
    log(f"building {CORPUS_MB} MB corpus...")
    chunk = make_bench_corpus(2_000_000, seed=7)
    reps = max(1, n // len(chunk.encode())) + 1
    corpus = (chunk * reps).encode()[:n]
    # ensure valid utf-8 at the cut
    while corpus[-1] & 0xC0 == 0x80:
        corpus = corpus[:-1]
    return corpus


def split_docs(corpus: bytes) -> list[str]:
    docs = []
    step = 1_000_000
    for i in range(0, len(corpus), step):
        d = corpus[i : i + step]
        while d and d[-1] & 0xC0 == 0x80:
            d = d[:-1]
        docs.append(d.decode("utf-8", errors="ignore"))
    return docs


def build_encoding(ranks):
    import tiktoken_tpu
    import tiktoken_tpu_ext.openai_public as pub

    return tiktoken_tpu.Encoding(
        "bench_o200k",
        pat_str=pub.o200k_pat_str,
        mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )


def sample_indices(docs) -> list[int]:
    return list(range(0, len(docs), max(1, len(docs) // 8)))


def timed(enc, docs, total_bytes, strategy: str, numpy_out: bool = False,
          chunk_rows: int | None = None):
    """Median-of-REPS rate over the identical full corpus.

    Only the parity-sample documents' tokens are retained from each run:
    keeping a full 64 MB corpus's list[list[int]] alive across rows (~15M
    tracked PyLongs per result) makes every later gen2 GC collection scan
    them, measured as a ~3x slowdown of later list-output rows. The
    perf_counter brackets exclude the del/collect."""
    import gc

    idx = sample_indices(docs)
    rates, sampled = [], None
    for _ in range(REPS):
        gc.collect()
        t0 = time.perf_counter_ns()
        if numpy_out:
            tokens, offsets = enc.encode_corpus_to_numpy(
                docs, strategy=strategy, chunk_rows=chunk_rows)
        else:
            result = enc.encode_corpus(docs, strategy=strategy,
                                       chunk_rows=chunk_rows)
        t1 = time.perf_counter_ns()
        rates.append(total_bytes / ((t1 - t0) / 1e9) / 1e6)
        if numpy_out:
            sampled = {i: tokens[offsets[i] : offsets[i + 1]] for i in idx}
            del tokens, offsets
        else:
            sampled = {i: result[i] for i in idx}
            del result
    return statistics.median(rates), sampled


def check_parity(docs, sampled, ranks) -> bool:
    """Byte-exact spot check vs the installed reference library."""
    import tiktoken
    import tiktoken_tpu_ext.openai_public as pub

    oracle = tiktoken.Encoding(
        "bench_oracle", pat_str=pub.o200k_pat_str, mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )
    return all(
        list(sampled[i]) == oracle.encode_ordinary(docs[i]) for i in sampled
    )


# ====================
# Device child: everything that can hang (tunnel) or compile for minutes
# runs here, under the parent's hard deadline. Prints one JSON line.
# ====================

def device_child(corpus_path: str, chunk_rows: int | None = None) -> None:
    ranks = get_vocab()
    with open(corpus_path, "rb") as f:
        corpus = f.read()
    docs = split_docs(corpus)
    total_bytes = sum(len(d.encode()) for d in docs)
    enc = build_encoding(ranks)

    import jax

    log(f"devices: {jax.devices()}")
    engine = enc.device_engine
    log(f"dfa states={engine.dfa.n_states}, "
        f"pair table={engine.pair_table.n_pairs} pairs, "
        f"buckets={engine.pair_table.n_buckets}"
        + (f", chunk_rows={chunk_rows}" if chunk_rows else ""))

    # worst_case=True also pre-compiles the cap-overflow retry variant so
    # a rare dense chunk can never inject a multi-minute compile into a
    # timed section
    log("warmup/compile...")
    t0 = time.time()
    if chunk_rows:
        enc.warmup(chunk_rows=chunk_rows, worst_case=True)
    else:
        enc.warmup(worst_case=True)
    _ = enc.encode_corpus(docs[:2], strategy="device", chunk_rows=chunk_rows)
    warmup_s = time.time() - t0
    log(f"warmup done in {warmup_s:.0f}s")

    log(f"timing device-only encode_corpus (median of {REPS})...")
    device_mbs, device_tokens = timed(enc, docs, total_bytes, "device",
                                      chunk_rows=chunk_rows)
    log(f"device-only: {device_mbs:.2f} MB/s")
    parity = check_parity(docs, device_tokens, ranks)
    log(f"device parity vs reference: {parity}")

    # hybrid rows: the production multi-core configuration; recorded on
    # 1-core boxes too so the auto policy stays auditable
    log("timing hybrid rows...")
    hybrid_mbs, _r = timed(enc, docs, total_bytes, "hybrid",
                           chunk_rows=chunk_rows)
    hybrid_numpy_mbs, hybrid_tokens = timed(enc, docs, total_bytes, "hybrid",
                                            numpy_out=True,
                                            chunk_rows=chunk_rows)
    parity = parity and check_parity(docs, hybrid_tokens, ranks)
    log(f"hybrid: {hybrid_mbs:.2f} | hybrid-numpy: {hybrid_numpy_mbs:.2f}")

    print(json.dumps({
        "ok": True,
        "parity": parity,
        "device_only": round(device_mbs, 2),
        "hybrid": round(hybrid_mbs, 2),
        "hybrid_numpy": round(hybrid_numpy_mbs, 2),
        "warmup_s": round(warmup_s, 1),
        "device_chunk_rows": chunk_rows or 0,
    }))


def run_device_child(corpus_path: str) -> dict:
    """Spawn the device section under a deadline; never raises.

    Two attempts: the small 2048-row tier first — its programs compile
    in minutes even at 20x tunnel slowdown (HARDWARE.md), so it almost
    always lands a measured device row — then the production chunk
    geometry with the remaining budget, whose result wins when its
    (much larger) compile fits, i.e. whenever the persistent executable
    cache is warm or the tunnel is healthy. The small tier is
    dispatch-floor dominated so its number underestimates production;
    device_chunk_rows in the JSON says which geometry the reported rows
    came from (0 = production)."""
    dead = {"ok": False, "parity": True, "device_only": 0.0,
            "hybrid": 0.0, "hybrid_numpy": 0.0, "warmup_s": 0.0,
            "device_chunk_rows": 0}
    deadline = time.time() + DEVICE_TIMEOUT_S
    best = None
    # small -> mid -> production; a later (larger-geometry) success
    # replaces an earlier one, so the reported rows come from the
    # largest geometry whose compile fits the budget
    for chunk_rows, share in ((2048, 0.3), (8192, 0.45), (None, 1.0)):
        remaining = deadline - time.time()
        if remaining <= 120:
            break
        timeout_s = min(DEVICE_TIMEOUT_S * share, remaining)
        attempt = _run_device_attempt(corpus_path, chunk_rows, timeout_s)
        if attempt is not None:
            best = attempt
    return best or dead


def _run_device_attempt(corpus_path, chunk_rows, timeout_s):
    import subprocess

    args = [sys.executable, os.path.abspath(__file__), "--device-child",
            corpus_path]
    if chunk_rows:
        args.append(str(chunk_rows))
    try:
        r = subprocess.run(
            args, stdout=subprocess.PIPE, stderr=None, timeout=timeout_s,
            text=True,
        )
    except subprocess.TimeoutExpired:
        log(f"device attempt (chunk_rows={chunk_rows or 'production'}) "
            f"timed out after {timeout_s:.0f}s")
        return None
    except Exception as e:  # noqa: BLE001 - the bench must always finish
        log(f"device section failed to launch: {e!r}")
        return None
    if r.returncode != 0:
        log(f"device attempt (chunk_rows={chunk_rows or 'production'}) "
            f"exited rc={r.returncode}")
        return None
    try:
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception:
        log("device attempt produced no JSON")
        return None


def probe_native_backend(timeout_s: float = 240.0) -> bool:
    """True if the native (TPU) backend initializes in a fresh
    subprocess within the timeout. The axon tunnel can be down for
    hours, in which case jax.devices() HANGS rather than raising — a
    direct call here would turn the whole benchmark into a timeout.
    Probing in a child process keeps this process clean; on failure the
    bench skips the device section and says so in the JSON."""
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
    if len(sys.argv) > 1 and sys.argv[1] == "--device-child":
        device_child(sys.argv[2],
                     int(sys.argv[3]) if len(sys.argv) > 3 else None)
        return

    ranks = get_vocab()
    corpus = get_corpus()
    docs = split_docs(corpus)
    total_bytes = sum(len(d.encode()) for d in docs)

    # ---- host + reference rows first: no device contact, cannot hang ----
    enc = build_encoding(ranks)
    _ = enc.encode_corpus(docs[:1], strategy="host")  # build the native core

    log(f"timing host-only encode_corpus (median of {REPS})...")
    host_mbs, host_tokens = timed(enc, docs, total_bytes, "host")
    log(f"host-only: {host_mbs:.2f} MB/s")
    parity = check_parity(docs, host_tokens, ranks)

    log(f"timing host encode_corpus_to_numpy (median of {REPS})...")
    host_numpy_mbs, host_numpy_tokens = timed(enc, docs, total_bytes, "host",
                                              numpy_out=True)
    log(f"host-numpy: {host_numpy_mbs:.2f} MB/s")
    parity = parity and check_parity(docs, host_numpy_tokens, ranks)
    log(f"host parity vs reference: {parity}")

    # reference baselines on the same host and the IDENTICAL corpus,
    # median of REPS like every row above: single-thread, its best
    # multi-threaded configuration (published peak ~16 threads,
    # BASELINE.md; capped at this box's core count), and its fastest
    # array-output configuration (per-doc encode_to_numpy, zero-copy
    # buffer protocol, in the same thread pool) — the reference's
    # analog of encode_corpus_to_numpy, so the headline compares
    # best-faith config to best-faith config.
    import tiktoken
    import tiktoken_tpu_ext.openai_public as pub

    oracle = tiktoken.Encoding(
        "bench_oracle", pat_str=pub.o200k_pat_str, mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )

    def ref_timed(fn):
        rates = []
        for _ in range(REPS):
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

    # ---- device section: child process under a hard deadline ----
    log("probing native backend...")
    native_ok = probe_native_backend()
    if native_ok:
        from tiktoken_tpu.ops.artifacts import _artifact_dir

        corpus_path = os.path.join(_artifact_dir(), "bench_corpus.bin")
        with open(corpus_path, "wb") as f:
            f.write(corpus)
        dev = run_device_child(corpus_path)
    else:
        log("NATIVE BACKEND UNAVAILABLE (tunnel down?) — host-only results")
        dev = {"ok": False, "parity": True, "device_only": 0.0,
               "hybrid": 0.0, "hybrid_numpy": 0.0, "warmup_s": 0.0}
    platform = "tpu" if dev["ok"] else ("tpu-unreachable" if native_ok else "cpu-fallback")
    parity = parity and dev["parity"]

    # auto scheduling: hybrid on multi-core hosts with a live device,
    # host otherwise (resolve_corpus_strategy; the device child's rows
    # stand in for the hybrid resolution so this process never touches
    # the backend)
    if dev["ok"] and (os.cpu_count() or 1) > 1:
        strategy = "hybrid"
        auto_mbs, auto_numpy_mbs = dev["hybrid"], dev["hybrid_numpy"]
    else:
        strategy = "host"
        auto_mbs, auto_numpy_mbs = host_mbs, host_numpy_mbs
    log(
        f"node: {auto_numpy_mbs:.1f} MB/s | device-only: {dev['device_only']:.1f}"
        f" | reference sequential: {ref_mbs:.1f}"
        f" | reference pool({n_thr}): {ref8_mbs:.1f}"
        f" | ref-numpy: {ref_numpy_mbs:.1f}"
    )

    if not parity:
        # a wrong tokenizer has no throughput
        auto_mbs = auto_numpy_mbs = 0.0
        dev["device_only"] = dev["hybrid"] = dev["hybrid_numpy"] = 0.0

    # The headline is the fastest faithful corpus configuration under
    # auto scheduling (array output — the corpus-scale analog of the
    # reference's encode_to_numpy); vs_baseline is measured against the
    # STRONGEST reference configuration on this host, not its
    # single-thread floor.
    print(
        json.dumps(
            {
                "metric": "o200k-pattern corpus encode to uint32 arrays, byte-exact (auto scheduling)",
                "value": round(auto_numpy_mbs, 2),
                "unit": "MB/s",
                "vs_baseline": round(auto_numpy_mbs / max(ref_best, 1e-9), 2),
                "list_out": round(auto_mbs, 2),
                "device_only": dev["device_only"],
                "host_only": round(host_mbs, 2),
                "host_numpy": round(host_numpy_mbs, 2),
                "hybrid": dev["hybrid"],
                "hybrid_numpy": dev["hybrid_numpy"],
                "ref_1thread": round(ref_mbs, 2),
                "ref_8thread": round(ref8_mbs, 2),
                "ref_numpy": round(ref_numpy_mbs, 2),
                "vs_ref_1thread": round(auto_numpy_mbs / max(ref_mbs, 1e-9), 2),
                "platform": platform,
                "resolved_strategy": strategy,
                "device_warmup_s": dev["warmup_s"],
                "device_chunk_rows": dev.get("device_chunk_rows", 0),
                "corpus_mb": round(total_bytes / 1e6, 1),
                "timing": f"median of {REPS}, identical full corpus for all rows",
            }
        )
    )


if __name__ == "__main__":
    main()
