"""Lane-aligned per-piece BPE merge.

Pieces live one-per-row in fixed W-lane slots (W=16 short / W=64 long),
so the greedy merge loop needs no segmented scans and no cross-row
gathers: the leftmost minimum-rank pair of each piece is ``argmin`` along
the lane axis (argmin returns the FIRST minimum — exactly the reference's
leftmost tie-break, reference: src/lib.rs:148-153), and all within-piece
pointer chasing is a W-way select sweep on the VPU.

Pair-rank lookups (the expensive random accesses, HARDWARE.md) happen
exactly once per adjacency: W-1 lookups up front, then 2 per merge round
(the two pairs whose right/left neighbour changed) — versus the previous
lockstep kernel's full-grid relookup every round.
"""

from __future__ import annotations

import numpy as np

from tiktoken_tpu.ops.pair_table import BUCKET_SLOTS, PairTable, RANK_MAX, lookup_numpy

INT_RANK_MAX = 0xFFFFFFFF


# ---------------------------------------------------------------------------
# numpy reference (spec for the jax kernel)
# ---------------------------------------------------------------------------


def slot_merge_numpy(
    table: PairTable, slot_bytes: np.ndarray, lens: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """slot_bytes [M, W] uint8 (zero-padded), lens [M] -> (tokens [M, W]
    uint32 at surviving lanes, alive [M, W] bool)."""
    M, W = slot_bytes.shape
    toks = np.zeros((M, W), dtype=np.uint32)
    alive = np.zeros((M, W), dtype=bool)
    for m in range(M):
        L = int(lens[m])
        cur = [int(table.byte_to_rank[b]) for b in slot_bytes[m, :L]]
        pos = list(range(L))
        while len(cur) > 1:
            ranks = lookup_numpy(
                table, np.asarray(cur[:-1], np.uint32), np.asarray(cur[1:], np.uint32)
            )
            k = int(np.argmin(ranks))
            if ranks[k] == RANK_MAX:
                break
            cur[k : k + 2] = [int(ranks[k])]
            pos[k + 1 : k + 2] = []
        for t, p in zip(cur, pos):
            toks[m, p] = t
            alive[m, p] = True
    return toks, alive


# ---------------------------------------------------------------------------
# jax kernel
# ---------------------------------------------------------------------------


def make_slot_merge_fn(seed: int, n_buckets: int, W: int, *, unroll: int = 4,
                       midcompact: bool | None = None,
                       midcompact_min: int = 4096):
    """jit-able: (buckets [nb,32] u32, byte_to_rank [256] u32,
    slot_bytes [M,W] u8, lens [M] i32)
    -> (tokens [M,W] u32, alive [M,W] bool, rounds i32).

    ``unroll`` merge steps run per while-loop iteration: the per-iteration
    cost on this backend is largely fixed (HARDWARE.md), so unrolling
    divides it; steps on already-finished pieces are masked no-ops.
    On the XLA:CPU backend the tuned-deep bodies only multiply compile
    time (the round-2 multichip gate timed out on them), so the depth is
    capped at 2 there; ``TIKTOKEN_TPU_MERGE_UNROLL`` overrides both.

    ``midcompact``: after the first unrolled round-group, most pieces
    are finished but every further round still pays full-arena traffic
    and two bucket row-gathers over all M lanes. The two-phase variant
    compacts still-active pieces into an M/4 pool, finishes the loop
    there, and routes results back (falling back to the full-arena loop
    via ``lax.cond`` if more than M/4 pieces survive — adversarial
    inputs only). Defaults on for non-CPU backends when M >=
    ``midcompact_min``; ``TIKTOKEN_TPU_MERGE_MIDCOMPACT=0/1`` overrides.
    """
    import os

    import jax
    import jax.numpy as jnp

    from tiktoken_tpu.ops.compaction import compact, route_right_multi

    env = os.environ.get("TIKTOKEN_TPU_MERGE_UNROLL")
    if env:
        unroll = int(env)
    elif jax.default_backend() == "cpu":
        unroll = min(unroll, 2)
    envm = os.environ.get("TIKTOKEN_TPU_MERGE_MIDCOMPACT")
    if envm:
        midcompact = envm != "0"
    elif midcompact is None:
        midcompact = jax.default_backend() != "cpu"
    envmin = os.environ.get("TIKTOKEN_TPU_MERGE_MIDCOMPACT_MIN")
    if envmin:
        midcompact_min = int(envmin)
    # Two-phase split tuning: phase 1 runs `phase1` substeps on the FULL
    # arena before compacting survivors into an M/pool_div pool. Full-
    # arena substeps dominate the stage cost, so compacting earlier can
    # win — but more survivors must then fit the pool, and a pool
    # overflow retries the whole loop on the full arena (lax.cond).
    phase1 = int(os.environ.get("TIKTOKEN_TPU_MERGE_PHASE1", unroll) or unroll)
    pool_div = int(os.environ.get("TIKTOKEN_TPU_MERGE_POOL_DIV", 4) or 4)

    mask = np.uint32(n_buckets - 1)

    def mix(a, b):
        a = np.uint32(seed) ^ a.astype(jnp.uint32)
        b = b.astype(jnp.uint32)
        h = a * np.uint32(0x9E3779B1) ^ (b + np.uint32(0x85EBCA6B) + (a << 6))
        h = h ^ (h >> 15)
        h = h * np.uint32(0x2C1B3C6D)
        h = h ^ (h >> 12)
        return h

    def lookup(buckets, a, b, ok):
        h = (mix(a, b) & mask).astype(jnp.int32)
        rows = buckets[jnp.where(ok, h, 0)]
        out = jnp.full(a.shape, RANK_MAX, dtype=jnp.uint32)
        for s in range(BUCKET_SLOTS):
            hit = (rows[..., 4 * s] == a) & (rows[..., 4 * s + 1] == b)
            out = jnp.where(hit, rows[..., 4 * s + 2], out)
        return jnp.where(ok, out, RANK_MAX)

    cols = np.arange(W, dtype=np.int32)

    def take(arr, pos):
        """arr [M,W], pos [M] -> arr[m, pos[m]] via a W-way select sweep
        (lane-local: no cross-row gather)."""
        return jnp.sum(jnp.where(cols[None, :] == pos[:, None], arr, 0), axis=1)

    def put(arr, pos, val, enable):
        sel = (cols[None, :] == pos[:, None]) & enable[:, None]
        return jnp.where(sel, val[:, None].astype(arr.dtype), arr)

    def merge(buckets, byte_to_rank, slot_bytes, lens):
        M = slot_bytes.shape[0]
        tok = byte_to_rank[slot_bytes.astype(jnp.int32)]  # [M,W]
        alive = cols[None, :] < lens[:, None]
        nxt = jnp.broadcast_to(cols[None, :] + 1, (M, W)).astype(jnp.int32)

        # initial adjacency ranks: one lookup per adjacent pair
        right0 = jnp.concatenate(
            [tok[:, 1:], jnp.zeros((M, 1), tok.dtype)], axis=1
        )
        ok0 = alive & (cols[None, :] + 1 < lens[:, None])
        r0 = lookup(buckets, tok, right0, ok0)

        def cond(state):
            _tok, _alive, _nxt, r, rounds = state
            return (r != RANK_MAX).any() & (rounds < W)

        def make_step(lens_):
            """substep/body bound to a piece-length vector (the compacted
            phase runs on compacted lens; arena size comes from state)."""

            def substep(state):
                tok, alive, nxt, r, rounds = state
                Mloc = tok.shape[0]
                rmin = jnp.min(r, axis=1)
                k = jnp.argmin(r, axis=1).astype(jnp.int32)  # leftmost min
                act = rmin != RANK_MAX

                j = take(nxt, k)  # right partner position
                jn = take(nxt, jnp.minimum(j, W - 1))  # partner's next
                new_tok = rmin  # merged id == pair rank

                tok = put(tok, k, new_tok, act)
                alive = alive & ~((cols[None, :] == j[:, None]) & act[:, None])
                nxt = put(nxt, k, jn, act)
                r = put(r, jnp.minimum(j, W - 1),
                        jnp.full((Mloc,), INT_RANK_MAX, jnp.uint32), act)

                # left alive neighbour l: the position with nxt[l] == k
                is_l = alive & (nxt == k[:, None]) & act[:, None] & (
                    cols[None, :] != k[:, None]
                )
                has_l = is_l.any(axis=1)
                l = jnp.argmax(is_l, axis=1).astype(jnp.int32)

                # two fresh lookups: (new_tok, right) and (left, new_tok)
                right_tok = take(tok, jnp.minimum(jn, W - 1))
                ok_r = act & (jn < lens_)
                r_k = lookup(buckets, new_tok, right_tok, ok_r)
                left_tok = take(tok, l)
                r_l = lookup(buckets, left_tok, new_tok, act & has_l)

                r = put(r, k, r_k, act)
                r = put(r, l, r_l, act & has_l)
                return tok, alive, nxt, r, rounds + 1

            def body(state):
                for _ in range(unroll):
                    state = substep(state)
                return state

            return substep, body

        substep, body = make_step(lens)

        st0 = (tok, alive, nxt, r0, jnp.int32(0))
        if not midcompact or M < midcompact_min:
            tok, alive, _nxt, _r, rounds = jax.lax.while_loop(cond, body, st0)
            return tok, alive, rounds

        # ---- two-phase: phase1 substeps, compact survivors, finish ----
        st = st0
        for _ in range(phase1):
            st = substep(st)
        tok1, alive1, nxt1, r1, rounds1 = st
        act = (r1 != RANK_MAX).any(axis=1)
        M2 = max(256, M // pool_div)
        idx = jnp.arange(M, dtype=jnp.int32)

        nb = W.bit_length()  # bits per nxt value (values 0..W)
        per = 32 // nb
        n_nxt_words = -(-W // per)
        nxt_words = []
        for g in range(n_nxt_words):
            word = jnp.zeros((M,), jnp.uint32)
            for i in range(g * per, min((g + 1) * per, W)):
                word = word | (
                    nxt1[:, i].astype(jnp.uint32) << (nb * (i - g * per))
                )
            nxt_words.append(word)
        n_alive_words = -(-W // 32)
        alive_words = []
        for g in range(n_alive_words):
            word = jnp.zeros((M,), jnp.uint32)
            for i in range(g * 32, min((g + 1) * 32, W)):
                word = word | (alive1[:, i].astype(jnp.uint32) << (i - g * 32))
            alive_words.append(word)

        payloads = (
            [idx, lens]
            + [tok1[:, i] for i in range(W)]
            + [r1[:, i] for i in range(W)]
            + nxt_words
            + alive_words
        )
        comp, n_act = compact(act, payloads, M2)
        c_idx = comp[0]
        fits = n_act <= M2

        lanes = jnp.arange(W, dtype=jnp.int32)[None, :]

        def unpack_alive(words):
            out = jnp.zeros((words[0].shape[0], W), bool)
            for g, word in enumerate(words):
                for i in range(g * 32, min((g + 1) * 32, W)):
                    out = out.at[:, i].set(((word >> (i - g * 32)) & 1) != 0)
            return out

        def run_compacted(_):
            lens2 = comp[1]
            tok2 = jnp.stack(comp[2 : 2 + W], axis=1)
            r2 = jnp.stack(comp[2 + W : 2 + 2 * W], axis=1)
            nxt2 = jnp.zeros((M2, W), jnp.int32)
            for g in range(n_nxt_words):
                word = comp[2 + 2 * W + g]
                for i in range(g * per, min((g + 1) * per, W)):
                    nxt2 = nxt2.at[:, i].set(
                        ((word >> (nb * (i - g * per))) & (2**nb - 1)).astype(
                            jnp.int32
                        )
                    )
            alive2 = unpack_alive(comp[2 + 2 * W + n_nxt_words :])
            live2 = jnp.arange(M2, dtype=jnp.int32) < n_act
            r2 = jnp.where(live2[:, None], r2, RANK_MAX)
            _sub2, body2 = make_step(lens2)
            tok3, alive3, _n3, _r3, rounds3 = jax.lax.while_loop(
                cond, body2, (tok2, alive2, nxt2, r2, rounds1)
            )
            dst = jnp.where(live2, c_idx, -1)
            alive3w = [
                sum(
                    (alive3[:, i].astype(jnp.uint32) << (i - g * 32))
                    for i in range(g * 32, min((g + 1) * 32, W))
                )
                for g in range(n_alive_words)
            ]
            routed = route_right_multi(
                dst, [tok3[:, i] for i in range(W)] + alive3w, M
            )
            tok_r = jnp.stack(routed[:W], axis=1)
            alive_r = unpack_alive(routed[W:])
            tok_out = jnp.where(act[:, None], tok_r, tok1)
            alive_out = jnp.where(act[:, None], alive_r, alive1)
            return tok_out, alive_out, rounds3

        def run_full(_):
            tok4, alive4, _n4, _r4, rounds4 = jax.lax.while_loop(cond, body, st)
            return tok4, alive4, rounds4

        return jax.lax.cond(fits, run_compacted, run_full, None)

    return merge
