"""Stage-level timing of the v2 device pipeline on real hardware.

Times each pipeline stage separately at the bench chunk geometry, using
cumulative jitted prefixes (classmap; +scan; +catalog; +extract+hit;
full pipeline) so stage costs come out as differences. Also times the
round-1 sequential gather scanner for comparison.

Usage: python scripts/profile_v2.py [CHUNK_ROWS] [ROW_BYTES]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
ROW = int(sys.argv[2]) if len(sys.argv) > 2 else 256


def timeit(fn, *args, n=5):
    """Fetch to host to truly block (HARDWARE.md: block_until_ready lies
    under the axon tunnel)."""
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
    from tiktoken_tpu.ops.engine import LOOK, pack_documents

    ranks, corpus = get_vocab_and_corpus()
    enc = tiktoken_tpu.Encoding(
        "prof", pat_str=pub.o200k_pat_str, mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )
    engine = enc.device_engine
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    # one chunk of packed rows at the bench geometry
    docs = []
    step = 1_000_000
    for i in range(0, min(len(corpus), 8_000_000), step):
        d = corpus[i : i + step]
        while d and d[-1] & 0xC0 == 0x80:
            d = d[:-1]
        docs.append(d)
    batch = pack_documents(docs, ROW)
    B = min(CHUNK_ROWS, batch.rows.shape[0])
    rows = jnp.asarray(batch.rows[:B])
    n_payload = jnp.asarray(batch.n_payload[:B])
    n_total = jnp.asarray(batch.n_total[:B])
    KL = batch.rows.shape[1]
    K = KL - LOOK
    mb = float(np.sum(batch.n_payload[:B])) / 1e6
    print(f"chunk: B={B} KL={KL} payload={mb:.2f} MB", file=sys.stderr)

    tables = engine._tables2()
    ct = engine.char_tables

    from tiktoken_tpu.ops.charclass import make_byte_classes_fn
    from tiktoken_tpu.ops.sweep_scan import make_char_scan_fn
    from tiktoken_tpu.ops.pieces import make_catalog_fn, make_extract_fn, make_vocab_hit_fn
    from tiktoken_tpu.ops.window_scan import make_seq_scan_fn

    N = B * K
    p_cap = max(256, N // 2)

    classes_fn = jax.jit(make_byte_classes_fn(ct))
    char_scan = make_char_scan_fn(ct, KL, K)
    catalog = make_catalog_fn(B, K, p_cap)
    extract = make_extract_fn(B, K, p_cap)
    hit = make_vocab_hit_fn(engine.vocab_table.seed, engine.vocab_table.n_buckets)
    eofc = ct.eof_class
    pp, mt = tables["scan2"]

    @jax.jit
    def stage_classes(rows, n_total):
        cls, _na = classes_fn(pp, mt, rows, n_total)
        return cls.astype(jnp.int32).sum()

    @jax.jit
    def stage_scan(rows, n_payload, n_total):
        cls, _na = classes_fn(pp, mt, rows, n_total)
        cls_ext = jnp.concatenate([cls, jnp.full((B, 1), eofc, cls.dtype)], axis=1)
        ps, bad = char_scan(cls_ext, n_payload, n_total)
        return ps.sum(), bad.sum()

    @jax.jit
    def stage_catalog(rows, n_payload, n_total):
        cls, _na = classes_fn(pp, mt, rows, n_total)
        cls_ext = jnp.concatenate([cls, jnp.full((B, 1), eofc, cls.dtype)], axis=1)
        ps, bad = char_scan(cls_ext, n_payload, n_total)
        starts, lens, n_pieces, _pid = catalog(ps, n_payload)
        return starts.sum() + lens.sum(), n_pieces

    @jax.jit
    def stage_hit(rows, n_payload, n_total):
        cls, _na = classes_fn(pp, mt, rows, n_total)
        cls_ext = jnp.concatenate([cls, jnp.full((B, 1), eofc, cls.dtype)], axis=1)
        ps, bad = char_scan(cls_ext, n_payload, n_total)
        starts, lens, n_pieces, _pid = catalog(ps, n_payload)
        words = extract(rows[:, :K], starts, lens)
        h = hit(tables["vocab"][0], words, lens)
        return h.astype(jnp.uint32).max(), n_pieces

    full = engine._pipeline2(B, KL)

    # old seq scanner for comparison
    seq = make_seq_scan_fn(KL, K, 257, 256)
    from tiktoken_tpu.ops.window_scan import expand_packed_to_bytes, pack_trans_accept
    pb = jnp.asarray(
        expand_packed_to_bytes(
            np.asarray(pack_trans_accept(engine.dfa.trans, engine.dfa.accept)),
            engine.dfa.class_of,
        )
    )

    @jax.jit
    def stage_seq(rows, n_payload, n_total):
        idx = jnp.arange(KL, dtype=jnp.int32)
        cls = jnp.where(idx[None, :] >= n_total[:, None], 256, rows.astype(jnp.int32))
        cls_ext = jnp.concatenate([cls, jnp.full((B, 1), 256, cls.dtype)], axis=1)
        ps, bad = seq(pb, cls_ext, n_payload, n_total)
        return ps.sum(), bad.sum()

    results = {}
    for name, fn, args in [
        ("classmap", stage_classes, (rows, n_total)),
        ("classmap+scan", stage_scan, (rows, n_payload, n_total)),
        ("...+catalog", stage_catalog, (rows, n_payload, n_total)),
        ("...+extract+hit", stage_hit, (rows, n_payload, n_total)),
        ("seq-scan (old)", stage_seq, (rows, n_payload, n_total)),
    ]:
        t0 = time.perf_counter()
        d, r = timeit(fn, *args)
        results[name] = d
        print(
            f"{name:18s}: {d*1000:8.2f} ms  ({mb/d:7.1f} MB/s)  "
            f"[compile+5 runs {time.perf_counter()-t0:.0f}s]",
            file=sys.stderr,
        )

    t0 = time.perf_counter()
    d, r = timeit(
        lambda *a: full(tables["scan2"], tables["buckets"],
                        tables["byte_to_rank"], tables["vocab"], *a),
        rows, n_payload, n_total,
    )
    results["full pipeline"] = d
    print(
        f"{'full pipeline':18s}: {d*1000:8.2f} ms  ({mb/d:7.1f} MB/s)  "
        f"[compile+5 runs {time.perf_counter()-t0:.0f}s]",
        file=sys.stderr,
    )
    hdr = np.asarray(r[1])
    print(f"n_tokens={hdr[-2]} overflow={hdr[-1]} bad_rows={hdr[B:2*B].sum()}",
          file=sys.stderr)




def profile_tail():
    """Merge + assembly isolation: time the full pipeline vs a variant
    with merges skipped (pieces forced to singles)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import get_vocab_and_corpus
    import tiktoken_tpu
    import tiktoken_tpu_ext.openai_public as pub
    from tiktoken_tpu.ops.engine import LOOK, pack_documents
    from tiktoken_tpu.ops.pieces import (
        LONG_SLOT, MISS, SLOT, make_catalog_fn, make_extract_fn, make_vocab_hit_fn,
    )
    from tiktoken_tpu.ops.slot_merge import make_slot_merge_fn
    from tiktoken_tpu.ops.charclass import make_byte_classes_fn
    from tiktoken_tpu.ops.sweep_scan import make_char_scan_fn

    ranks, corpus = get_vocab_and_corpus()
    enc = tiktoken_tpu.Encoding(
        "prof", pat_str=pub.o200k_pat_str, mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": len(ranks)},
    )
    engine = enc.device_engine
    docs = []
    for i in range(0, min(len(corpus), 8_000_000), 1_000_000):
        d = corpus[i : i + 1_000_000]
        while d and d[-1] & 0xC0 == 0x80:
            d = d[:-1]
        docs.append(d)
    batch = pack_documents(docs, ROW)
    B = min(CHUNK_ROWS, batch.rows.shape[0])
    rows = jnp.asarray(batch.rows[:B])
    n_payload = jnp.asarray(batch.n_payload[:B])
    n_total = jnp.asarray(batch.n_total[:B])
    KL = batch.rows.shape[1]
    K = KL - LOOK
    mb = float(np.sum(batch.n_payload[:B])) / 1e6
    tables = engine._tables2()
    ct = engine.char_tables
    N = B * K
    p_cap = max(256, N // 2)
    m_cap = max(256, N // 16)
    l_cap = max(64, N // 512)

    classes_fn = make_byte_classes_fn(ct)
    char_scan = make_char_scan_fn(ct, KL, K)
    catalog = make_catalog_fn(B, K, p_cap)
    extract = make_extract_fn(B, K, p_cap)
    hit = make_vocab_hit_fn(engine.vocab_table.seed, engine.vocab_table.n_buckets)
    merge16 = make_slot_merge_fn(engine.pair_table.seed, engine.pair_table.n_buckets, SLOT)
    eofc = ct.eof_class
    pp, mt = tables["scan2"]

    def prefix(rows, n_payload, n_total):
        cls, _na = classes_fn(pp, mt, rows, n_total)
        cls_ext = jnp.concatenate([cls, jnp.full((B, 1), eofc, cls.dtype)], axis=1)
        ps, bad = char_scan(cls_ext, n_payload, n_total)
        starts, lens, n_pieces, _pid = catalog(ps, n_payload)
        words = extract(rows[:, :K], starts, lens)
        h = hit(tables["vocab"][0], words, lens)
        return starts, lens, words, h

    @jax.jit
    def upto_merge(rows, n_payload, n_total):
        starts, lens, words, h = prefix(rows, n_payload, n_total)
        slot_b = jax.lax.bitcast_convert_type(words[:, :, None], jnp.uint8)
        slot_bytes = slot_b.reshape(p_cap, SLOT)
        is_short = (lens >= 2) & (lens <= SLOT) & (h == MISS)
        m_idx = jnp.nonzero(is_short, size=m_cap, fill_value=p_cap - 1)[0]
        m_real = is_short[m_idx]
        m_bytes = slot_bytes[m_idx]
        m_lens = jnp.where(m_real, lens[m_idx], 0)
        m_tok, m_alive, r1 = merge16(
            tables["buckets"], tables["byte_to_rank"], m_bytes, m_lens
        )
        return m_tok.astype(jnp.uint32).max(), m_alive.sum(), r1

    print("timing ...+short-merge (adds nonzero-compact + merge16)...",
          file=sys.stderr)
    d, r = timeit(upto_merge, rows, n_payload, n_total)
    print(f"{'...+merge16':18s}: {d*1000:8.2f} ms  ({mb/d:7.1f} MB/s) rounds={r[2]}",
          file=sys.stderr)

    @jax.jit
    def only_nonzero(rows, n_payload, n_total):
        starts, lens, words, h = prefix(rows, n_payload, n_total)
        is_short = (lens >= 2) & (lens <= SLOT) & (h == MISS)
        m_idx = jnp.nonzero(is_short, size=m_cap, fill_value=p_cap - 1)[0]
        return m_idx.sum()

    d, r = timeit(only_nonzero, rows, n_payload, n_total)
    print(f"{'...+nonzero only':18s}: {d*1000:8.2f} ms  ({mb/d:7.1f} MB/s)",
          file=sys.stderr)




if __name__ == "__main__":
    (profile_tail if os.environ.get("PROFILE_TAIL") else main)()
