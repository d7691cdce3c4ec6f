"""Stage-level timing of the v3 device pipeline on real hardware.

Builds the v3 stages at the bench chunk geometry and times cumulative
jitted prefixes; stage costs are the successive differences.

Usage: python scripts/profile_v3.py [CHUNK_ROWS] [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
KARG = int(sys.argv[2]) if len(sys.argv) > 2 else None


def timeit(fn, *args, n=5):
    import jax
    import numpy as np

    r = jax.tree.map(lambda x: np.asarray(x), fn(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = jax.tree.map(lambda x: np.asarray(x), fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, r


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import get_vocab_and_corpus
    import tiktoken_tpu
    import tiktoken_tpu_ext.openai_public as pub
    from tiktoken_tpu.ops import pipeline3 as p3
    from tiktoken_tpu.ops.charclass import make_byte_classes_fn
    from tiktoken_tpu.ops.compaction import compact
    from tiktoken_tpu.ops.sweep_scan import make_char_scan_fn

    K = KARG or p3.K_DEFAULT
    KP, KL = p3.row_geometry(K)

    ranks, corpus = get_vocab_and_corpus()
    enc = tiktoken_tpu.Encoding(
        "prof", pat_str=pub.o200k_pat_str, mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )
    engine = enc.device_engine
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    docs = []
    for i in range(0, min(len(corpus), 8_000_000), 1_000_000):
        d = corpus[i : i + 1_000_000]
        while d and d[-1] & 0xC0 == 0x80:
            d = d[:-1]
        docs.append(d)
    pc = p3.pack_corpus3(docs, K)
    C = CHUNK_ROWS
    S = -(-(C * KP + KL + 8) // 128) * 128
    # one chunk's inputs (first chunk, dummy ghost)
    nreal = min(C - 1, pc.row_off.shape[0])
    idx = np.arange(nreal)
    off = np.zeros(C, np.int32)
    pay = np.zeros(C, np.int32)
    tot = np.zeros(C, np.int32)
    dend = np.zeros(C, bool)
    prev = np.zeros(C, bool)
    emit = np.zeros(C, bool)
    off[1 : nreal + 1] = pc.row_off[idx]
    pay[1 : nreal + 1] = pc.n_payload[idx]
    tot[1 : nreal + 1] = pc.n_total[idx]
    dend[1 : nreal + 1] = pc.is_doc_end[idx]
    prev[1 : nreal + 1] = pc.prev_same_doc[idx]
    emit[1 : nreal + 1] = True
    flat = pc.flat[:S]
    if flat.shape[0] < S:
        flat = np.concatenate([flat, np.zeros(S - flat.shape[0], np.uint8)])
    mb = float(pay.sum()) / 1e6
    print(f"chunk: C={C} K={K} KP={KP} KL={KL} payload={mb:.2f} MB", file=sys.stderr)

    args = tuple(
        jnp.asarray(x) for x in (flat, off, pay, tot, dend, prev, emit)
    )
    tables = engine._tables2()
    ct = engine.char_tables
    pp, mt = tables["scan2"]
    classes_fn = make_byte_classes_fn(ct)
    scan_fn = make_char_scan_fn(ct, KL, KP, handshake=True)
    eofc = ct.eof_class
    N = C * KP

    def row_gather(flat, row_off):
        def one(o):
            return jax.lax.dynamic_slice(flat, (o,), (KL,))
        return jax.vmap(one)(row_off)

    @jax.jit
    def s_rows(flat, off, pay, tot, dend, prev, emit):
        rows = row_gather(flat, off)
        return rows.astype(jnp.int32).sum()

    @jax.jit
    def s_classes(flat, off, pay, tot, dend, prev, emit):
        rows = row_gather(flat, off)
        cls, _na = classes_fn(pp, mt, rows, tot)
        return cls.sum()

    @jax.jit
    def s_scan(flat, off, pay, tot, dend, prev, emit):
        rows = row_gather(flat, off)
        cls, _na = classes_fn(pp, mt, rows, tot)
        cls_ext = jnp.concatenate([cls, jnp.full((C, 1), eofc, cls.dtype)], 1)
        mask, f, bad = scan_fn(cls_ext, pay, tot, dend)
        return mask.sum(), f.sum(), bad.sum()

    p_cap = max(256, N // 6)

    @jax.jit
    def s_catalog(flat, off, pay, tot, dend, prev, emit):
        rows = row_gather(flat, off)
        cls, _na = classes_fn(pp, mt, rows, tot)
        cls_ext = jnp.concatenate([cls, jnp.full((C, 1), eofc, cls.dtype)], 1)
        mask, f, bad = scan_fn(cls_ext, pay, tot, dend)
        mask3 = mask & emit[:, None]
        rows_i = jnp.arange(C, dtype=jnp.int32)
        colsKL = jnp.arange(KL, dtype=jnp.int32)[None, :]
        pos_grid = rows_i[:, None] * KL + colsKL
        mask3x = jnp.concatenate([mask3, jnp.zeros((C, KL - KP), bool)], 1)
        (starts, prow, pend), n_pieces = compact(
            mask3x.reshape(-1),
            [pos_grid.reshape(-1),
             jnp.broadcast_to(rows_i[:, None], (C, KL)).reshape(-1),
             jnp.broadcast_to((rows_i * KL + f)[:, None], (C, KL)).reshape(-1)],
            p_cap,
        )
        return starts.sum(), n_pieces

    full = engine._pipeline3(C, K)

    def stage_stop_fn(stop):
        fn = jax.jit(
            p3.build_pipeline3_fn(
                K=K, C=C, flat_size=S,
                char_tables=engine.char_tables,
                pair_seed=engine.pair_table.seed,
                pair_buckets=engine.pair_table.n_buckets,
                vocab_seed=engine.vocab_table.seed,
                vocab_buckets=engine.vocab_table.n_buckets,
                long_seed=engine.long_vocab_table.seed,
                long_buckets=engine.long_vocab_table.n_buckets,
                pack24=engine.pack24,
                stage_stop=stop,
            )
        )
        return lambda *a: fn(tables["scan2"], tables["buckets"],
                             tables["byte_to_rank"], tables["vocab"], *a)

    for name, fn in [
        ("row-gather", s_rows),
        ("+classmap", s_classes),
        ("+scan", s_scan),
        ("+catalog", s_catalog),
        ("+ext+hit", stage_stop_fn("hit")),
        ("+asm (no mrg)", stage_stop_fn("nomerge")),
    ]:
        t0 = time.perf_counter()
        d, r = timeit(fn, *args)
        print(f"{name:12s}: {d*1000:8.2f} ms ({mb/d:7.1f} MB/s) [tot {time.perf_counter()-t0:.0f}s]",
              file=sys.stderr)

    t0 = time.perf_counter()
    d, r = timeit(
        lambda *a: full(tables["scan2"], tables["buckets"],
                        tables["byte_to_rank"], tables["vocab"], *a),
        *args,
    )
    hdr = np.asarray(r[1])
    print(f"{'full v3':12s}: {d*1000:8.2f} ms ({mb/d:7.1f} MB/s) [tot {time.perf_counter()-t0:.0f}s]",
          file=sys.stderr)
    print(f"n_tokens={hdr[-2]} overflow={hdr[-1]} bad={hdr[C:2*C].sum()}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
