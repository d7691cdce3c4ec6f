"""Device pipeline v2: piece-slot tokenization.

    rows [B,K] ── window scan + orbit ──> piece_start [B,K]
        ── catalog ──> starts/lens per piece (flat scan order)
        ── extract ──> short slots [P,4]u32 / long slots [L,64]u8
        ── vocab hit (one row gather per piece) ──> hit ids
        ── slot merge on misses only ──> per-piece token lists
        ── assembly (cumsum + one masked scatter) ──> flat token stream
           + per-row token counts

Versus v1 (ops/engine.py lockstep merge over the full [B,K] grid), the
expensive random accesses now scale with pieces and merges instead of
bytes x rounds: one vocab row-gather per piece, one pair row-gather per
adjacency, two per merge round on the miss subset only. This is the
device realisation of the reference's vocab-as-cache short-circuit
(reference: src/lib.rs:247-254, 367-369).

Static caps (p_cap/m_cap/l_cap/t_cap) keep every shape compile-time
constant; a chunk that overflows any cap sets the `overflow` flag and the
caller reruns it through the v1 pipeline (rare: degenerate inputs only).
Pieces longer than LONG_SLOT mark their row for host fallback, exactly
like unresolved scan windows.
"""

from __future__ import annotations

import numpy as np

from tiktoken_tpu.ops.pieces import (
    LONG_SLOT,
    MISS,
    SLOT,
    make_catalog_fn,
    make_extract_fn,
    make_long_vocab_hit_fn,
    make_vocab_hit_fn,
)
from tiktoken_tpu.ops.slot_merge import make_slot_merge_fn
from tiktoken_tpu.ops.window_scan import make_seq_scan_fn


def build_pipeline2_fn(
    *,
    row_total: int,
    look: int,
    pair_seed: int,
    pair_buckets: int,
    vocab_seed: int,
    vocab_buckets: int,
    long_seed: int,
    long_buckets: int,
    B: int,
    pack24: bool = False,
    char_tables=None,
):
    """Returns the pure jit-able v2 pipeline for a fixed [B, row_total]
    chunk geometry.

    Signature:
        (scan_tables, pair_buckets_arr, byte_to_rank,
         vocab_buckets_arr, rows [B,KL] u8, n_payload [B] i32,
         n_total [B] i32)
        -> (flat_tokens [t_cap] u32 — or, with pack24, [3*t_cap/4] u32 of
            3-byte little-endian token ids (ids < 2^24; fetches 25% less
            over the host link) —
            header [2B+2] i32 = [row_counts | row_bad | n_tokens | overflow])

    ``scan_tables`` selects the scanner: with ``char_tables`` given (a
    charclass.CharClassTables), it is the (page_planes, mixed_t) pair and
    the boundary scan runs the gather-free char-level select-sweep kernel
    (ops/sweep_scan); otherwise it is the byte-indexed packed transition
    table and the scan is the round-1 sequential gather kernel."""
    import jax
    import jax.numpy as jnp

    KL = row_total
    K = KL - look
    N = B * K
    p_cap = max(256, N // 2)
    m_cap = max(256, N // 16)
    l_cap = max(64, N // 512)
    # multiple of 4 so the pack24 bitcast (3*t_cap bytes -> u32) is exact
    # even for odd row_capacity values
    t_cap = -(-max(512, N // 2) // 4) * 4

    if char_tables is not None:
        from tiktoken_tpu.ops.charclass import make_byte_classes_fn
        from tiktoken_tpu.ops.sweep_scan import make_char_scan_fn

        classes_fn = make_byte_classes_fn(char_tables)
        char_scan = make_char_scan_fn(char_tables, KL, K)
        eof_cls = char_tables.eof_class
    else:
        scan_fn = make_seq_scan_fn(KL, K, 257, 256)  # byte-indexed table
    catalog_fn = make_catalog_fn(B, K, p_cap)
    extract_fn = make_extract_fn(B, K, p_cap)
    hit_fn = make_vocab_hit_fn(vocab_seed, vocab_buckets)
    long_hit_fn = make_long_vocab_hit_fn(long_seed, long_buckets)
    merge16 = make_slot_merge_fn(pair_seed, pair_buckets, SLOT)
    merge64 = make_slot_merge_fn(pair_seed, pair_buckets, LONG_SLOT)

    cols64 = np.arange(LONG_SLOT, dtype=np.int32)

    def extract_long(rows, starts, lens):
        """[l_cap, 64] u8 long-piece slots (zero-padded)."""
        flat = rows.reshape(-1)
        flat32 = jax.lax.bitcast_convert_type(
            flat.reshape(-1, 4), jnp.uint32
        ).reshape(-1)
        flat32 = jnp.concatenate([flat32, jnp.zeros((24,), jnp.uint32)])
        w0 = jnp.minimum(starts >> 2, N // 4)
        colw = w0[:, None] + jnp.arange(17, dtype=jnp.int32)[None, :]
        w = flat32[colw]  # [L, 17]
        shift = ((starts & 3) << 3).astype(jnp.uint32)[:, None]
        lo = w[:, :16] >> shift
        hi = jnp.where(shift > 0, w[:, 1:17] << (32 - shift), 0)
        words = (lo | hi).astype(jnp.uint32)  # [L, 16] = 64 bytes
        b = jax.lax.bitcast_convert_type(words[:, :, None], jnp.uint8)
        byts = b.reshape(words.shape[0], 64)
        return jnp.where(cols64[None, :] < lens[:, None], byts, 0)

    def pipeline(
        scan_tables, pair_rows, byte_to_rank, vocab_rows,
        rows, n_payload, n_total,
    ):
        vocab_rows, vocab_long_rows = vocab_rows
        na_overflow = False
        if char_tables is not None:
            page_planes, mixed_t = scan_tables
            cls, na_overflow = classes_fn(page_planes, mixed_t, rows, n_total)
            cls_ext = jnp.concatenate(
                [cls, jnp.full((B, 1), eof_cls, cls.dtype)], axis=1
            )
            piece_start, row_bad = char_scan(cls_ext, n_payload, n_total)
        else:
            # byte-or-EOF grid (pure vector op; the byte-indexed transition
            # table makes the class lookup unnecessary)
            idx = jnp.arange(KL, dtype=jnp.int32)
            cls = jnp.where(
                idx[None, :] >= n_total[:, None], 256, rows.astype(jnp.int32)
            )
            cls_ext = jnp.concatenate(
                [cls, jnp.full((B, 1), 256, cls.dtype)], axis=1
            )
            piece_start, row_bad = scan_fn(
                scan_tables, cls_ext, n_payload, n_total
            )

        starts, lens, n_pieces, _pid = catalog_fn(piece_start, n_payload)
        # strictly below p_cap: slot p_cap-1 is the fill target for the
        # miss/long compactions and must stay a padding piece
        overflow = (n_pieces > p_cap - 1) | na_overflow

        # rows containing over-long pieces fall back to the host
        too_long = lens > LONG_SLOT
        row_of = jnp.minimum(starts // K, B - 1)
        row_bad = row_bad | (
            jnp.zeros((B,), bool).at[row_of].max(too_long)
        )

        words = extract_fn(rows[:, :K], starts, lens)  # [P,4] u32
        hit = hit_fn(vocab_rows, words, lens)  # [P] u32, MISS if none

        slot_b = jax.lax.bitcast_convert_type(words[:, :, None], jnp.uint8)
        slot_bytes = slot_b.reshape(p_cap, SLOT)
        first_byte = slot_bytes[:, 0].astype(jnp.int32)

        is_short = (lens >= 2) & (lens <= SLOT) & (hit == MISS)
        is_long = (lens > SLOT) & (lens <= LONG_SLOT)

        # ---- short misses ------------------------------------------------
        m_idx = jnp.nonzero(is_short, size=m_cap, fill_value=p_cap - 1)[0]
        m_real = is_short[m_idx]
        m_overflow = jnp.sum(is_short.astype(jnp.int32)) > m_cap
        m_bytes = slot_bytes[m_idx]
        m_lens = jnp.where(m_real, lens[m_idx], 0)
        m_tok, m_alive, _r1 = merge16(pair_rows, byte_to_rank, m_bytes, m_lens)
        m_alive = m_alive & m_real[:, None]

        # ---- long pieces --------------------------------------------------
        l_idx = jnp.nonzero(is_long, size=l_cap, fill_value=p_cap - 1)[0]
        l_real = is_long[l_idx]
        l_overflow = jnp.sum(is_long.astype(jnp.int32)) > l_cap
        l_bytes = extract_long(rows[:, :K], starts[l_idx],
                               jnp.where(l_real, lens[l_idx], 0))
        l_lens = jnp.where(l_real, lens[l_idx], 0)
        # 17..64-byte whole-piece hits bypass the merge (reference
        # vocab-as-cache semantics, src/lib.rs:367-369)
        l_hit = long_hit_fn(vocab_long_rows, l_bytes, l_lens)
        l_is_hit = l_hit != MISS
        l_tok, l_alive, _r2 = merge64(
            pair_rows, byte_to_rank, l_bytes, jnp.where(l_is_hit, 0, l_lens)
        )
        lane0 = jnp.arange(LONG_SLOT, dtype=jnp.int32)[None, :] == 0
        l_tok = jnp.where(lane0 & l_is_hit[:, None], l_hit[:, None], l_tok)
        l_alive = l_alive | (lane0 & l_is_hit[:, None])
        l_alive = l_alive & l_real[:, None]

        # ---- per-piece token counts ---------------------------------------
        counts = jnp.zeros((p_cap,), jnp.int32)
        counts = jnp.where(lens == 1, 1, counts)
        counts = jnp.where((lens >= 2) & (hit != MISS) & (lens <= SLOT), 1, counts)
        m_counts = jnp.sum(m_alive.astype(jnp.int32), axis=1)
        counts = counts.at[m_idx].add(jnp.where(m_real, m_counts, 0))
        l_counts = jnp.sum(l_alive.astype(jnp.int32), axis=1)
        counts = counts.at[l_idx].add(jnp.where(l_real, l_counts, 0))

        off = jnp.cumsum(counts) - counts  # exclusive prefix, piece order
        n_tokens = off[-1] + counts[-1]
        # strictly below t_cap: slot t_cap-1 is the masked-scatter dump
        # target and must never hold a real token
        overflow = overflow | m_overflow | l_overflow | (n_tokens > t_cap - 1)

        flat = jnp.zeros((t_cap,), jnp.uint32)

        # singles: len==1 byte tokens and whole-piece hits
        single_tok = jnp.where(
            lens == 1, byte_to_rank[first_byte], hit
        )
        is_single = (lens == 1) | ((lens >= 2) & (lens <= SLOT) & (hit != MISS))
        tgt = jnp.where(is_single, jnp.minimum(off, t_cap - 1), t_cap - 1)
        flat = flat.at[tgt].max(jnp.where(is_single, single_tok, 0))

        # short-miss tokens: lane rank within alive -> off + rank
        m_rank = jnp.cumsum(m_alive.astype(jnp.int32), axis=1) - 1
        m_off = off[m_idx][:, None] + m_rank
        m_tgt = jnp.where(m_alive, jnp.minimum(m_off, t_cap - 1), t_cap - 1)
        flat = flat.at[jnp.reshape(m_tgt, -1)].max(
            jnp.reshape(jnp.where(m_alive, m_tok, 0), -1)
        )

        # long tokens
        l_rank = jnp.cumsum(l_alive.astype(jnp.int32), axis=1) - 1
        l_off = off[l_idx][:, None] + l_rank
        l_tgt = jnp.where(l_alive, jnp.minimum(l_off, t_cap - 1), t_cap - 1)
        flat = flat.at[jnp.reshape(l_tgt, -1)].max(
            jnp.reshape(jnp.where(l_alive, l_tok, 0), -1)
        )

        # per-row token counts (pieces are in row-major scan order)
        row_counts = jnp.zeros((B,), jnp.int32).at[row_of].add(
            jnp.where(lens > 0, counts, 0)
        )

        if pack24:
            b0 = (flat & 0xFF).astype(jnp.uint8)
            b1 = ((flat >> 8) & 0xFF).astype(jnp.uint8)
            b2 = ((flat >> 16) & 0xFF).astype(jnp.uint8)
            bytes3 = jnp.stack([b0, b1, b2], axis=1).reshape(-1)
            flat = jax.lax.bitcast_convert_type(
                bytes3.reshape(-1, 4), jnp.uint32
            )

        # single-fetch header: [row_counts | row_bad | n_tokens | overflow]
        header = jnp.concatenate(
            [
                row_counts,
                row_bad.astype(jnp.int32),
                n_tokens[None],
                overflow.astype(jnp.int32)[None],
            ]
        )
        return flat, header

    return pipeline
