"""Scatter-free stable compaction and anchor expansion.

The random-access wall (HARDWARE.md) prices every scatter/gather element
at ~10ns; the v2 pipeline's `nonzero`/`.at[].min` catalog and assembly
steps therefore cost ~10-20 ms/MB. Both are instances of *monotone
routing*, which needs no random access at all:

- **Stable compaction** moves element i left to slot
  ``dst(i) = popcount(valid[:i])``. Displacements ``i - dst(i)`` are
  non-decreasing in i, so radix routing works: for each bit b of the
  displacement, shift the still-misplaced elements left by 2^b with one
  roll + select. log2(n) rounds of pure VPU ops — no collisions, no
  scatter (the classic prefix-sum routing network).
- **Anchor expansion** is the inverse: element i moves right to
  ``offset(i) = exclusive_cumsum(count)[i]`` (non-decreasing
  displacements again), leaving gaps that a log-depth prefix-max fill
  propagates into (anchor id, within-run index) pairs.

Both route an arbitrary tuple of payload arrays in one pass.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# numpy specs
# ---------------------------------------------------------------------------


def compact_numpy(valid: np.ndarray, payloads, out_size: int, fill=0):
    """Stable left-compaction along the LAST axis. Returns (list of
    compacted payloads [... , out_size], count [...])."""
    valid = np.asarray(valid, bool)
    lead = valid.shape[:-1]
    outs = [
        np.full(lead + (out_size,), fill, dtype=np.asarray(p).dtype)
        for p in payloads
    ]
    counts = np.zeros(lead, dtype=np.int32)
    for idx in np.ndindex(*lead) if lead else [()]:
        sel = np.nonzero(valid[idx])[0]
        n = min(len(sel), out_size)
        counts[idx] = len(sel)
        for o, p in zip(outs, payloads):
            o[idx][:n] = np.asarray(p)[idx][sel[:n]]
    return outs, counts


def expand_numpy(counts: np.ndarray, payloads, out_size: int):
    """Anchor expansion: anchor i owns `counts[i]` consecutive output
    slots, in order. Returns (list of payload arrays [out_size] with
    anchor i's value over its run, within-run index k [out_size],
    valid [out_size], total)."""
    n = len(counts)
    outs = [np.zeros(out_size, dtype=np.asarray(p).dtype) for p in payloads]
    ks = np.zeros(out_size, dtype=np.int32)
    valid = np.zeros(out_size, dtype=bool)
    j = 0
    for i in range(n):
        for k in range(int(counts[i])):
            if j >= out_size:
                break
            for o, p in zip(outs, payloads):
                o[j] = np.asarray(p)[i]
            ks[j] = k
            valid[j] = True
            j += 1
    return outs, ks, valid, int(np.sum(counts))


# ---------------------------------------------------------------------------
# jax implementations
# ---------------------------------------------------------------------------


def compact(valid, payloads, out_size: int):
    """jax stable compaction along the last axis (any leading dims).

    (valid [..., n] bool, payloads: sequence of [..., n] arrays)
    -> (compacted payloads [..., out_size] (zero-filled past count),
        count [...] int32 of valid entries, clamped at nothing —
        callers compare against out_size for overflow).
    """
    import jax.numpy as jnp

    n = valid.shape[-1]
    vi = valid.astype(jnp.int32)
    dst = jnp.cumsum(vi, axis=-1) - vi  # exclusive prefix = target slot
    count = dst[..., -1] + vi[..., -1]
    disp = jnp.arange(n, dtype=jnp.int32) - dst  # >= 0, non-decreasing
    disp = jnp.where(valid, disp, -1)  # invalid entries never route

    vals = [p for p in payloads]
    rounds = max(1, (n - 1).bit_length())
    for b in range(rounds):
        step = 1 << b
        move = (disp >= 0) & ((disp & step) != 0)
        # shift left by `step`: out[j] takes in[j+step] when that element
        # still needs this displacement bit
        take = jnp.concatenate(
            [move[..., step:], jnp.zeros(move.shape[:-1] + (step,), bool)],
            axis=-1,
        )
        keep = (disp >= 0) & ~move
        new_vals = []
        for v in vals:
            shifted = jnp.concatenate(
                [v[..., step:], jnp.zeros(v.shape[:-1] + (step,), v.dtype)],
                axis=-1,
            )
            new_vals.append(jnp.where(take, shifted, jnp.where(keep, v, 0)))
        vals = new_vals
        sh_d = jnp.concatenate(
            [disp[..., step:], jnp.full(disp.shape[:-1] + (step,), -1, disp.dtype)],
            axis=-1,
        )
        disp = jnp.where(take, sh_d - step, jnp.where(keep, disp, -1))
    if out_size > n:
        pad = out_size - n
        vals = [
            jnp.concatenate(
                [v, jnp.zeros(v.shape[:-1] + (pad,), v.dtype)], axis=-1
            )
            for v in vals
        ]
    return [v[..., :out_size] for v in vals], count


def route_right_multi(dst, payloads, out_size: int):
    """Monotone rightward radix route of flat payloads to slots ``dst``
    (strictly increasing over routed entries, ``dst - index >= 0``;
    dst < 0 drops). High displacement bits first — the collision-free
    order for rightward moves (see ``expand``). Unrouted output slots
    are zero."""
    import jax.numpy as jnp

    n = dst.shape[0]
    m = max(n, out_size)
    vals = list(payloads)
    if m > n:
        pad = m - n
        dst = jnp.concatenate([dst, jnp.full((pad,), -1, dst.dtype)])
        vals = [
            jnp.concatenate([v, jnp.zeros((pad,), v.dtype)]) for v in vals
        ]
    disp = jnp.where(dst >= 0, dst - jnp.arange(m, dtype=jnp.int32), -1)
    rounds = max(1, (m - 1).bit_length())
    for b in reversed(range(rounds)):
        step = 1 << b
        move = (disp >= 0) & ((disp & step) != 0)
        take = jnp.concatenate([jnp.zeros((step,), bool), move[:-step]])
        keep = (disp >= 0) & ~move

        def sh(a, fill):
            return jnp.concatenate([jnp.full((step,), fill, a.dtype), a[:-step]])

        vals = [jnp.where(take, sh(v, 0), jnp.where(keep, v, 0)) for v in vals]
        disp = jnp.where(take, sh(disp, -1) - step, jnp.where(keep, disp, -1))
    return [v[:out_size] for v in vals]


def expand(counts, payloads, out_size: int):
    """jax anchor expansion over flat arrays.

    (counts [n] i32 >= 0, payloads: sequence of [n] arrays)
    -> (expanded payloads [out_size], k [out_size] within-run index,
        valid [out_size], total i32). Anchor i's payload covers its run
    of counts[i] consecutive output slots; k counts within the run.
    Runs beyond out_size are cropped (callers flag overflow via total).

    Two monotone routing passes: first compact the nonzero-count anchors
    (so every anchor's output offset >= its slot index), then radix-route
    them right to their offsets and prefix-fill the gaps.
    """
    import jax
    import jax.numpy as jnp

    n = counts.shape[0]
    has = counts > 0
    total = jnp.sum(counts)
    offs = jnp.cumsum(counts) - counts  # exclusive prefix

    m = max(n, out_size)
    (c_off, c_cnt, *c_pay), n_anchors = compact(
        has, [offs, counts] + list(payloads), m
    )

    src = jnp.arange(m, dtype=jnp.int32)
    live = src < n_anchors
    disp = jnp.where(live, c_off - src, -1)  # >= 0: compacted anchors

    arena = [c_off, *c_pay]
    rounds = max(1, (m - 1).bit_length())
    # rightward routing must consume HIGH displacement bits first: with
    # low bits first, an anchor one slot short of a stationary one
    # overruns it (e.g. displacements [1, 2] from slots [0, 1]). The
    # mirrored argument makes LOW-first the collision-free order for the
    # leftward routing in `compact`.
    for b in reversed(range(rounds)):
        step = 1 << b
        move = (disp >= 0) & ((disp & step) != 0)
        take = jnp.concatenate([jnp.zeros((step,), bool), move[:-step]])
        keep = (disp >= 0) & ~move
        sh = lambda a, fill: jnp.concatenate(
            [jnp.full((step,), fill, a.dtype), a[:-step]]
        )
        arena = [
            jnp.where(take, sh(v, 0), jnp.where(keep, v, 0)) for v in arena
        ]
        disp = jnp.where(take, sh(disp, -1) - step, jnp.where(keep, disp, -1))

    anchor_off = arena[0]
    anchor_here = disp == 0
    # prefix fill: each slot takes the nearest anchor at or before it
    pos = jnp.where(anchor_here, src, -1)

    def combine(a, b):
        take_b = b[0] >= a[0]
        return tuple(jnp.where(take_b, y, x) for x, y in zip(a, b))

    filled = jax.lax.associative_scan(
        combine,
        (pos, anchor_off) + tuple(arena[1:]),
    )
    fpos = filled[0]
    k = src - fpos
    valid = (fpos >= 0) & (src < total)
    return [v[:out_size] for v in filled[2:]], k[:out_size], valid[:out_size], total
