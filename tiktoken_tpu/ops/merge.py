"""Data-parallel BPE merge: the device form of the greedy merge loop.

The reference merges one lowest-rank pair at a time per piece
(reference: src/lib.rs:140-196 small, 47-138 heap). Pieces are mutually
independent (the regex split bounds them; merges never cross a piece
boundary), so the device runs every piece's sequential greedy loop in
lockstep: each round merges, in every piece, the single leftmost
minimum-rank pair. That is *exactly* sequential greedy, just batched.

Why not more merges per round: any rule that merges several pairs of one
piece per round (local minima, equal-rank chains, windowed minima) is
unsound for general rank tables — a merge can create a brand-new pair
whose rank undercuts another selected pair two positions away, and such
cascades travel arbitrarily far. Found by fuzzing, kept as a regression
test (tests/test_merge.py::test_random_vocab_fuzz).

Round rule, all [B, K] arrays, piece boundaries static:

    r[k]      rank of pair (token at k, next alive token) via the PairTable
    merge[k]  iff r[k] finite AND r[k] <  segmented-prefix-min(r)[k)
                            AND r[k] <= segmented-suffix-min(r)(k]

(strictly smaller than everything before it in the piece, no smaller rank
after it: the leftmost piece minimum). The looked-up rank doubles as the
merged token id (the BPE invariant), and convergence is bounded by the
longest piece's merge count. State is positional skip-lists (token id,
alive bit, next pointer); merging flips one alive bit and splices.
"""

from __future__ import annotations

import numpy as np

from tiktoken_tpu.ops.pair_table import PairTable, RANK_MAX, lookup_numpy

INT_RANK_MAX = 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Reference implementation (numpy, one block): the semantic spec for the
# jax kernel, itself fuzzed against the sequential oracle.
# ---------------------------------------------------------------------------


def merge_block_numpy(
    table: PairTable,
    byte_vals: np.ndarray,  # [K] uint8
    piece_start: np.ndarray,  # [K] bool (position 0 must be True if valid)
    valid: np.ndarray,  # [K] bool (False = padding / separators)
) -> tuple[np.ndarray, np.ndarray]:
    """Run merge rounds over one block. Returns (token_ids, alive_mask)."""
    K = len(byte_vals)
    tok = table.byte_to_rank[byte_vals].astype(np.uint32)
    alive = valid.copy()
    nxt = np.arange(1, K + 1)
    seg = np.cumsum(piece_start | ~valid)  # piece id per position

    def pair_ranks() -> np.ndarray:
        nxt_c = np.minimum(nxt, K - 1)
        right_tok = tok[nxt_c]
        ok = alive & (nxt < K)
        ok &= valid[nxt_c] & ~piece_start[nxt_c]
        r = lookup_numpy(table, tok, right_tok)
        return np.where(ok, r, RANK_MAX)

    r = pair_ranks()
    while True:
        m = _leftmost_piece_min_numpy(r, seg)
        if not m.any():
            break
        k_idx = np.nonzero(m)[0]
        j_idx = nxt[k_idx]
        tok[k_idx] = r[k_idx]  # merged token id == pair rank
        alive[j_idx] = False
        nxt[k_idx] = nxt[j_idx]
        r = pair_ranks()
    return tok, alive


def _leftmost_piece_min_numpy(r: np.ndarray, seg: np.ndarray) -> np.ndarray:
    """merge[k] = r[k] finite, strictly below every earlier rank in its
    piece, and no strictly smaller rank later in the piece."""
    K = len(r)
    pref = np.full(K, INT_RANK_MAX, dtype=np.uint64)
    suf = np.full(K, INT_RANK_MAX, dtype=np.uint64)
    run = INT_RANK_MAX
    cur = -1
    for k in range(K):
        if seg[k] != cur:
            run = INT_RANK_MAX
            cur = seg[k]
        pref[k] = run
        run = min(run, int(r[k]))
    run = INT_RANK_MAX
    cur = -1
    for k in range(K - 1, -1, -1):
        suf[k] = run if seg[k] == cur else INT_RANK_MAX
        if seg[k] != cur:
            run = INT_RANK_MAX
            cur = seg[k]
        run = min(run, int(r[k]))
    rr = r.astype(np.uint64)
    return (rr != INT_RANK_MAX) & (rr < pref) & (rr <= suf)


def encode_block_tokens_numpy(table, byte_vals, piece_start, valid) -> list[int]:
    tok, alive = merge_block_numpy(table, byte_vals, piece_start, valid)
    return [int(t) for t in tok[alive]]


# ---------------------------------------------------------------------------
# JAX device implementation (batched blocks)
# ---------------------------------------------------------------------------


def make_merge_fn(seed: int, n_buckets: int):
    """Build the merge function for given static table geometry.

    Signature of the returned fn:
        (buckets [n_buckets, 32] uint32, byte_to_rank,
         byte_vals [B,K] uint8, piece_start [B,K] bool, valid [B,K] bool)
        -> (tokens [B,K] uint32, alive [B,K] bool, rounds [] int32)
    """
    import jax
    import jax.numpy as jnp

    from tiktoken_tpu.ops.pair_table import BUCKET_SLOTS

    mask = np.uint32(n_buckets - 1)

    def mix(a, b):
        a = np.uint32(seed) ^ a.astype(jnp.uint32)
        b = b.astype(jnp.uint32)
        h = a * np.uint32(0x9E3779B1) ^ (b + np.uint32(0x85EBCA6B) + (a << 6))
        h = h ^ (h >> 15)
        h = h * np.uint32(0x2C1B3C6D)
        h = h ^ (h >> 12)
        return h

    def lookup(buckets, a, b):
        # ONE row gather per query (HARDWARE.md: row fetches cost the same
        # as element fetches), then 8 vectorized slot compares.
        h = (mix(a, b) & mask).astype(jnp.int32)
        rows = buckets[h]  # [..., 32]
        out = jnp.full(a.shape, RANK_MAX, dtype=jnp.uint32)
        for s in range(BUCKET_SLOTS):
            hit = (rows[..., 4 * s] == a) & (rows[..., 4 * s + 1] == b)
            out = jnp.where(hit, rows[..., 4 * s + 2], out)
        return out

    def seg_cummin(r, piece_start_cols, reverse: bool):
        """Segmented exclusive cummin along axis 1. ``piece_start_cols`` is
        True at segment heads (for reverse=True, pass heads of the REVERSED
        array, i.e. segment tails)."""
        import jax.numpy as jnp

        if reverse:
            r = r[:, ::-1]
        # inclusive segmented scan, then shift to exclusive
        def op(a, b):
            av, ab = a
            bv, bb = b
            v = jnp.where(bb, bv, jnp.minimum(av, bv))
            return v, ab | bb

        v, _ = jax.lax.associative_scan(
            op, (r, piece_start_cols), axis=1
        )
        # exclusive: shift right by one, MAX at segment heads
        v = jnp.concatenate(
            [jnp.full((r.shape[0], 1), RANK_MAX, dtype=r.dtype), v[:, :-1]], axis=1
        )
        v = jnp.where(piece_start_cols, RANK_MAX, v)
        if reverse:
            v = v[:, ::-1]
        return v

    def merge(buckets, byte_to_rank, byte_vals, piece_start, valid):
        B, K = byte_vals.shape
        tok0 = byte_to_rank[byte_vals.astype(jnp.int32)]
        alive0 = valid
        nxt0 = jnp.broadcast_to(jnp.arange(1, K + 1, dtype=jnp.int32), (B, K))

        seg_head = piece_start | ~valid
        seg_head = seg_head.at[:, 0].set(True)
        # segment tails = positions before the next head
        seg_tail = jnp.concatenate(
            [seg_head[:, 1:], jnp.ones((B, 1), dtype=bool)], axis=1
        )

        def pair_ranks(tok, alive, nxt):
            nxt_c = jnp.minimum(nxt, K - 1)
            right_tok = jnp.take_along_axis(tok, nxt_c, axis=1)
            ok = alive & (nxt < K)
            ok &= jnp.take_along_axis(valid, nxt_c, axis=1)
            ok &= ~jnp.take_along_axis(piece_start, nxt_c, axis=1)
            r = lookup(buckets, tok, right_tok)
            return jnp.where(ok, r, RANK_MAX)

        def cond(state):
            _tok, _alive, _nxt, r, rounds = state
            return (r != RANK_MAX).any() & (rounds < K)

        def body(state):
            tok, alive, nxt, r, rounds = state
            pref = seg_cummin(r, seg_head, reverse=False)
            suf = seg_cummin(r, seg_tail[:, ::-1], reverse=True)
            m = (r != RANK_MAX) & (r < pref) & (r <= suf)

            # One merge per piece: targets are distinct by construction.
            tok = jnp.where(m, r, tok)
            j_c = jnp.minimum(jnp.where(m, nxt, K), K - 1)
            jj = jnp.take_along_axis(nxt, j_c, axis=1)
            row = jnp.arange(B, dtype=jnp.int32)[:, None]
            killed = jnp.zeros_like(alive).at[row, j_c].max(m)
            alive = alive & ~killed
            nxt = jnp.where(m, jj, nxt)
            r = pair_ranks(tok, alive, nxt)
            return tok, alive, nxt, r, rounds + 1

        r0 = pair_ranks(tok0, alive0, nxt0)
        tok, alive, _nxt, _r, rounds = jax.lax.while_loop(
            cond, body, (tok0, alive0, nxt0, r0, jnp.int32(0))
        )
        return tok, alive, rounds

    return merge
