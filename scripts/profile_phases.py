"""Phase-level microbenchmark of the device pipeline on real hardware.

Times, per pipeline stage at a fixed chunk shape:
  - class map
  - window scan (the per-position DFA hops)
  - orbit (pointer doubling)
  - merge loop (lockstep greedy)
  - full pipeline

Usage: python scripts/profile_phases.py [ROWS] [ROW_BYTES]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ROW = int(sys.argv[2]) if len(sys.argv) > 2 else 2048


def timeit(fn, *args, n=5):
    """NOTE: on the axon tunnel, block_until_ready returns before the work
    completes (HARDWARE.md); only fetching data to host truly blocks."""
    import jax

    r = fn(*args)
    r = jax.tree.map(lambda x: __import__("numpy").asarray(x), r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
        r = jax.tree.map(lambda x: __import__("numpy").asarray(x), r)
    return (time.perf_counter() - t0) / n, r


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import get_vocab_and_corpus
    import tiktoken_tpu
    import tiktoken_tpu_ext.openai_public as pub
    from tiktoken_tpu.ops.engine import LOOK, pack_documents
    from tiktoken_tpu.ops.window_scan import make_window_scan_fn, make_orbit_fn
    from tiktoken_tpu.ops.merge import make_merge_fn

    ranks, corpus = get_vocab_and_corpus()
    enc = tiktoken_tpu.Encoding(
        "prof", pat_str=pub.o200k_pat_str, mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )
    engine = enc.device_engine
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    print(f"dfa states={engine.dfa.n_states} classes={engine.dfa.n_classes} "
          f"pairs={engine.pair_table.n_pairs} "
          f"buckets={engine.pair_table.n_buckets}", file=sys.stderr)

    doc = corpus[: ROWS * ROW + 10000].decode("utf-8", errors="ignore").encode()
    batch = pack_documents([doc], ROW)
    rows = batch.rows[:ROWS]
    n_payload = batch.n_payload[:ROWS]
    n_total = batch.n_total[:ROWS]
    nbytes = int(n_payload.sum())
    B, KL = rows.shape
    K = KL - LOOK
    W = engine.window
    t = engine._tables()

    eof_cls = int(engine.dfa.class_of[256])
    scan_fn = jax.jit(make_window_scan_fn(W, engine.dfa.n_states, engine.dfa.n_classes))
    orbit_fn = jax.jit(make_orbit_fn(K))
    merge_fn = jax.jit(make_merge_fn(engine.pair_table.seed, engine.pair_table.n_buckets))

    rows_d = jnp.asarray(rows)
    npay_d = jnp.asarray(n_payload)
    ntot_d = jnp.asarray(n_total)

    @jax.jit
    def classes_fn(class_of, rows, n_total):
        idx = jnp.arange(KL, dtype=jnp.int32)
        cls = class_of[rows.astype(jnp.int32)]
        cls = jnp.where(idx[None, :] >= n_total[:, None], eof_cls, cls)
        return jnp.concatenate(
            [cls, jnp.full((rows.shape[0], max(0, W - LOOK)), eof_cls, cls.dtype)],
            axis=1,
        )

    dt, cls_ext = timeit(classes_fn, t["class_of"], rows_d, ntot_d)
    print(f"classes : {dt*1e3:8.2f} ms  {nbytes/dt/1e6:9.1f} MB/s")

    dt, (hop, unresolved) = timeit(scan_fn, t["trans"], t["accept"], cls_ext)
    print(f"scan    : {dt*1e3:8.2f} ms  {nbytes/dt/1e6:9.1f} MB/s")

    dt, piece_start = timeit(orbit_fn, hop, npay_d)
    print(f"orbit   : {dt*1e3:8.2f} ms  {nbytes/dt/1e6:9.1f} MB/s")

    idx = np.arange(K, dtype=np.int32)
    valid = jnp.asarray(idx[None, :] < n_payload[:, None])
    dt, (tok, alive, rounds) = timeit(
        merge_fn, t["buckets"], t["byte_to_rank"],
        rows_d[:, :K], piece_start, valid,
    )
    print(f"merge   : {dt*1e3:8.2f} ms  {nbytes/dt/1e6:9.1f} MB/s   rounds={int(rounds)}")

    fn = engine._pipeline(B, KL)
    dt, _ = timeit(fn, t["trans"], t["accept"], t["class_of"],
                   t["buckets"], t["byte_to_rank"],
                   rows_d, npay_d, ntot_d)
    print(f"full    : {dt*1e3:8.2f} ms  {nbytes/dt/1e6:9.1f} MB/s")


if __name__ == "__main__":
    main()
