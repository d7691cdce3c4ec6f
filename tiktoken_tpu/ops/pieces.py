"""Piece catalog, slot extraction, and whole-piece vocabulary hits.

The reference's hot loop short-circuits BPE whenever a regex piece is
itself a vocabulary token — "the vocab is the cache" (reference:
src/lib.rs:247-254, 367-369). On TPU this is the key to beating the
random-access wall (HARDWARE.md): instead of running merge rounds over
every byte position, pieces are compacted into fixed 16-byte lane-aligned
slots, probed against a bucketized vocabulary table with ONE row gather
per piece, and only the misses enter the merge loop.

Pipeline stages (all static shapes, overflow -> caller fallback):

    piece_start [B,K] ──catalog──> starts/len/pid     (cumsum + one scatter)
    rows [B,K]       ──extract──> slots [P,16] u8     (one 5-word slice-gather
                                                        + byte alignment shifts)
    slots            ──vocab hit──> hit_id | MISS      (one 64-lane row gather
                                                        + 10 slot compares)

Vocabulary table layout: bucket = 64 uint32 lanes = 10 slots of
(b0,b1,b2,b3,len,id) — token bytes little-endian, zero-padded past len
(the canonical padding extraction also produces), so equality is 5 lane
compares. Tokens longer than 16 bytes never hit (their pieces take the
long-slot path); build reseeds until no bucket exceeds 10 entries.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

SLOT = 16  # short-piece slot bytes; pieces longer go to the long path
LONG_SLOT = 64
VOCAB_BUCKET_SLOTS = 10
VOCAB_BUCKET_WIDTH = 64
LONG_BUCKET_SLOTS = 7  # 7 x (16 words + len + id) = 126 of 128 lanes
LONG_BUCKET_WIDTH = 128
MISS = np.uint32(0xFFFFFFFF)


def _mix_words(words: np.ndarray, length: np.ndarray, seed: int):
    """uint32 hash of (4 packed words, len); numpy/jax polymorphic."""
    h = (words[..., 0] ^ np.uint32(seed)) * np.uint32(0x9E3779B1)
    for i in (1, 2, 3):
        h = (h ^ words[..., i]) * np.uint32(0x85EBCA77)
        h = h ^ (h >> np.uint32(13))
    h = (h ^ length.astype(np.uint32)) * np.uint32(0xC2B2AE3D)
    h = h ^ (h >> np.uint32(16))
    return h


@dataclass
class VocabTable:
    buckets: np.ndarray  # [n_buckets, 64] uint32
    n_buckets: int
    seed: int
    n_short: int  # tokens with len <= SLOT


def pack_token(token: bytes) -> np.ndarray:
    w = np.zeros(4, dtype=np.uint32)
    padded = token + b"\0" * (SLOT - len(token))
    w[:] = np.frombuffer(padded, dtype=np.uint32)
    return w


def build_vocab_table(mergeable_ranks: dict[bytes, int]) -> VocabTable:
    toks = [(t, r) for t, r in mergeable_ranks.items() if 2 <= len(t) <= SLOT]
    n = len(toks)
    n_buckets = 1
    while n_buckets < max(64, n):
        n_buckets *= 2
    words = np.stack([pack_token(t) for t, _ in toks]) if n else np.zeros((0, 4), np.uint32)
    lens = np.asarray([len(t) for t, _ in toks], dtype=np.uint32)
    ids = np.asarray([r for _, r in toks], dtype=np.uint32)

    for attempt in range(64):
        seed = 0xF00D0000 + attempt
        h = (_mix_words(words, lens, seed) & np.uint32(n_buckets - 1)).astype(np.int64)
        counts = np.bincount(h, minlength=n_buckets)
        if counts.max(initial=0) <= VOCAB_BUCKET_SLOTS:
            break
    else:
        raise RuntimeError("could not bucket vocab table without overflow")

    buckets = np.zeros((n_buckets, VOCAB_BUCKET_WIDTH), dtype=np.uint32)
    order = np.argsort(h, kind="stable")
    hs = h[order]
    first = np.ones(n, dtype=bool)
    first[1:] = hs[1:] != hs[:-1]
    run_start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
    slot = np.arange(n) - run_start
    cols = slot * 6
    for i in range(4):
        buckets[hs, cols + i] = words[order, i]
    buckets[hs, cols + 4] = lens[order]
    buckets[hs, cols + 5] = ids[order]
    # len == 0 marks an empty slot; real entries have len >= 2, and query
    # pieces have len >= 1, so empty slots can never match.
    return VocabTable(buckets=buckets, n_buckets=n_buckets, seed=seed, n_short=n)


@dataclass
class LongVocabTable:
    """Whole-piece hits for 17..64-byte tokens.

    The reference's hot loop short-circuits on ANY whole-piece vocabulary
    hit regardless of length (reference: src/lib.rs:367-369) — that is
    semantics, not just caching: for an adversarial vocabulary, BPE of a
    vocab token's bytes need not reproduce the token. The short table
    (VocabTable) covers <= 16-byte keys; this one covers the long-slot
    range, so the device path matches the reference for every piece it
    handles. Bucket row = 128 uint32 lanes = 7 slots of
    (16 packed words, len, id); len == 0 marks empty (real entries have
    len >= 17)."""

    buckets: np.ndarray  # [n_buckets, 128] uint32
    n_buckets: int
    seed: int
    n_long: int  # tokens with SLOT < len <= LONG_SLOT


def _mix_words16(words: np.ndarray, length, seed: int):
    """uint32 hash of (16 packed words, len); numpy/jax polymorphic.
    Mixes every word so adversarial keys differing only in their tail
    still spread."""
    h = (words[..., 0] ^ np.uint32(seed)) * np.uint32(0x9E3779B1)
    for i in range(1, 16):
        h = (h ^ words[..., i]) * np.uint32(0x85EBCA77)
        h = h ^ (h >> np.uint32(13))
    h = (h ^ length.astype(np.uint32)) * np.uint32(0xC2B2AE3D)
    h = h ^ (h >> np.uint32(16))
    return h


def pack_token_long(token: bytes) -> np.ndarray:
    padded = token + b"\0" * (LONG_SLOT - len(token))
    return np.frombuffer(padded, dtype=np.uint32).copy()


def build_long_vocab_table(mergeable_ranks: dict[bytes, int]) -> LongVocabTable:
    toks = [(t, r) for t, r in mergeable_ranks.items() if SLOT < len(t) <= LONG_SLOT]
    n = len(toks)
    n_buckets = 1
    while n_buckets < max(8, n):
        n_buckets *= 2
    words = (
        np.stack([pack_token_long(t) for t, _ in toks])
        if n
        else np.zeros((0, 16), np.uint32)
    )
    lens = np.asarray([len(t) for t, _ in toks], dtype=np.uint32)
    ids = np.asarray([r for _, r in toks], dtype=np.uint32)

    for attempt in range(64):
        seed = 0xBEEF0000 + attempt
        h = (_mix_words16(words, lens, seed) & np.uint32(n_buckets - 1)).astype(
            np.int64
        )
        counts = np.bincount(h, minlength=n_buckets)
        if counts.max(initial=0) <= LONG_BUCKET_SLOTS:
            break
    else:
        raise RuntimeError("could not bucket long vocab table without overflow")

    buckets = np.zeros((n_buckets, LONG_BUCKET_WIDTH), dtype=np.uint32)
    order = np.argsort(h, kind="stable")
    hs = h[order]
    first = np.ones(n, dtype=bool)
    first[1:] = hs[1:] != hs[:-1]
    run_start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
    slot = np.arange(n) - run_start
    cols = slot * 18
    for i in range(16):
        buckets[hs, cols + i] = words[order, i]
    buckets[hs, cols + 16] = lens[order]
    buckets[hs, cols + 17] = ids[order]
    return LongVocabTable(buckets=buckets, n_buckets=n_buckets, seed=seed, n_long=n)


def long_vocab_hit_numpy(table: LongVocabTable, slot_bytes: np.ndarray, lens: np.ndarray):
    """slot_bytes [M, 64] u8 zero-padded past len -> hit id or MISS."""
    words = slot_bytes.reshape(-1, 16, 4).astype(np.uint32)
    words = (
        words[:, :, 0]
        | (words[:, :, 1] << 8)
        | (words[:, :, 2] << 16)
        | (words[:, :, 3] << 24)
    )
    l = lens.astype(np.uint32)
    h = (_mix_words16(words, l, table.seed) & np.uint32(table.n_buckets - 1)).astype(
        np.int64
    )
    rows = table.buckets[h]
    out = np.full(len(lens), MISS, dtype=np.uint32)
    for s in range(LONG_BUCKET_SLOTS):
        c = 18 * s
        hit = (rows[:, c + 16] == l) & (l > SLOT)
        for i in range(16):
            hit &= rows[:, c + i] == words[:, i]
        out = np.where(hit & (out == MISS), rows[:, c + 17], out)
    return out


def make_long_vocab_hit_fn(seed: int, n_buckets: int):
    """jit-able: (buckets [nb,128] u32, slot_bytes [M,64] u8, lens [M] i32)
    -> hit ids [M] u32 (MISS if none; only SLOT < len <= LONG_SLOT can hit)."""
    import jax
    import jax.numpy as jnp

    mask = np.uint32(n_buckets - 1)

    def hit_fn(buckets, slot_bytes, lens):
        words = jax.lax.bitcast_convert_type(
            slot_bytes.reshape(-1, 16, 4), jnp.uint32
        )  # [M, 16] little-endian
        l = lens.astype(jnp.uint32)
        h = (_mix_words16(words, l, seed) & mask).astype(jnp.int32)
        rows = buckets[h]  # [M, 128] one row gather
        out = jnp.full(words.shape[0], MISS, dtype=jnp.uint32)
        for s in range(LONG_BUCKET_SLOTS):
            c = 18 * s
            ok = (rows[:, c + 16] == l) & (l > SLOT)
            for i in range(16):
                ok &= rows[:, c + i] == words[:, i]
            out = jnp.where(ok, rows[:, c + 17], out)
        return out

    return hit_fn


# ---------------------------------------------------------------------------
# numpy reference implementations (the spec for the jax versions)
# ---------------------------------------------------------------------------


def catalog_numpy(piece_start: np.ndarray, n_payload: np.ndarray, p_cap: int):
    """(starts [P_cap], lens [P_cap], n_pieces). Positions are flat indices
    into the [B,K] grid; padding entries have len 0."""
    B, K = piece_start.shape
    starts_list = []
    lens_list = []
    for b in range(B):
        row_starts = np.nonzero(piece_start[b])[0]
        for i, s in enumerate(row_starts):
            e = row_starts[i + 1] if i + 1 < len(row_starts) else n_payload[b]
            starts_list.append(b * K + s)
            lens_list.append(int(e) - int(s))
    n = len(starts_list)
    starts = np.full(p_cap, B * K, dtype=np.int32)
    lens = np.zeros(p_cap, dtype=np.int32)
    starts[:n] = starts_list[:p_cap]
    lens[:n] = lens_list[:p_cap]
    return starts, lens, n


def extract_numpy(rows: np.ndarray, starts: np.ndarray, lens: np.ndarray):
    """slots [P_cap, 4] uint32 little-endian, zero-padded past len."""
    flat = rows.reshape(-1)
    out = np.zeros((len(starts), SLOT), dtype=np.uint8)
    N = len(flat)
    for p, (s, l) in enumerate(zip(starts, lens)):
        l = min(int(l), SLOT)
        if l > 0 and s < N:
            out[p, :l] = flat[s : s + l]
    return out.view(np.uint32).reshape(len(starts), 4)


def vocab_hit_numpy(table: VocabTable, words: np.ndarray, lens: np.ndarray):
    h = (_mix_words(words, lens.astype(np.uint32), table.seed)
         & np.uint32(table.n_buckets - 1)).astype(np.int64)
    rows = table.buckets[h]
    out = np.full(len(words), MISS, dtype=np.uint32)
    for s in range(VOCAB_BUCKET_SLOTS):
        c = 6 * s
        hit = (rows[:, c + 4] == lens) & (lens > 0)
        for i in range(4):
            hit &= rows[:, c + i] == words[:, i]
        out = np.where(hit & (out == MISS), rows[:, c + 5], out)
    return out


# ---------------------------------------------------------------------------
# jax implementations
# ---------------------------------------------------------------------------


def make_catalog_fn(B: int, K: int, p_cap: int):
    """jit-able: (piece_start [B,K] bool, n_payload [B] i32)
    -> (starts [P_cap] i32 flat-index, lens [P_cap] i32, n_pieces i32,
        pid [B,K] i32 piece index per position)."""
    import jax.numpy as jnp

    N = B * K

    def catalog(piece_start, n_payload):
        flat = piece_start.reshape(-1)
        pid_incl = jnp.cumsum(flat.astype(jnp.int32)) - 1  # piece idx per pos
        n_pieces = pid_incl[-1] + 1
        idx = jnp.arange(N, dtype=jnp.int32)
        tgt = jnp.where(flat, jnp.minimum(pid_incl, p_cap - 1), p_cap - 1)
        starts = jnp.full((p_cap,), N, dtype=jnp.int32).at[tgt].min(
            jnp.where(flat & (pid_incl < p_cap), idx, N)
        )
        # piece end: next start, capped at its row's payload end
        next_start = jnp.concatenate([starts[1:], jnp.full((1,), N, jnp.int32)])
        row = jnp.minimum(starts // K, B - 1)
        row_end = row * K + n_payload[row]
        ends = jnp.minimum(jnp.where(next_start > starts, next_start, N), row_end)
        lens = jnp.maximum(ends - starts, 0)
        lens = jnp.where(starts >= N, 0, lens)
        return starts, lens, n_pieces, pid_incl.reshape(B, K)

    return catalog


def make_extract_fn(B: int, K: int, p_cap: int):
    """jit-able: (rows [B,K] u8, starts, lens) -> words [P_cap, 4] u32,
    zero-padded past min(len, SLOT)."""
    import jax
    import jax.numpy as jnp

    N = B * K

    def extract(rows, starts, lens):
        flat = rows.reshape(-1)
        flat32 = jax.lax.bitcast_convert_type(
            flat.reshape(-1, 4), jnp.uint32
        ).reshape(-1)  # [N/4] little-endian words
        pad = jnp.zeros((8,), jnp.uint32)
        flat32 = jnp.concatenate([flat32, pad])
        w0 = jnp.minimum(starts >> 2, N // 4)  # clamped word start
        # gather 5 consecutive words per piece
        cols = w0[:, None] + jnp.arange(5, dtype=jnp.int32)[None, :]
        w = flat32[cols]  # [P, 5]
        shift = ((starts & 3) << 3).astype(jnp.uint32)[:, None]  # 0/8/16/24
        lo = w[:, :4] >> shift
        hi = jnp.where(shift > 0, w[:, 1:5] << (32 - shift), 0)
        words = lo | hi  # [P, 4] bytes starting exactly at `starts`
        # zero bytes at positions >= len (canonical padding)
        l = jnp.clip(lens, 0, SLOT)[:, None]
        byte_idx = jnp.arange(4, dtype=jnp.int32)[None, :]
        nbytes = jnp.clip(l - byte_idx * 4, 0, 4)
        mask = jnp.where(
            nbytes >= 4,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << (nbytes.astype(jnp.uint32) << 3)) - 1,
        )
        return words & mask

    return extract


def make_vocab_hit_fn(seed: int, n_buckets: int):
    """jit-able: (buckets [nb,64] u32, words [P,4] u32, lens [P] i32)
    -> hit ids [P] u32 (MISS if none)."""
    import jax.numpy as jnp

    mask = np.uint32(n_buckets - 1)

    def hit_fn(buckets, words, lens):
        l = lens.astype(jnp.uint32)
        h = (_mix_words(words, l, seed) & mask).astype(jnp.int32)
        rows = buckets[h]  # [P, 64] one row gather
        out = jnp.full(words.shape[0], MISS, dtype=jnp.uint32)
        for s in range(VOCAB_BUCKET_SLOTS):
            c = 6 * s
            ok = (rows[:, c + 4] == l) & (l > 0)
            for i in range(4):
                ok &= rows[:, c + i] == words[:, i]
            out = jnp.where(ok, rows[:, c + 5], out)
        return out

    return hit_fn
