"""Distributed BPE training primitives: the device-side "training step".

The reference trains only in its educational module — count adjacent
pairs, merge the most frequent, repeat (reference:
tiktoken/_educational.py:119-185). The hot part of that loop is the pair
*count* over the corpus; the merge decision is an argmax over the counts.
On a TPU mesh the step is: every chip counts adjacent-token pairs in its
corpus shard into a hashed histogram (scatter-add over a power-of-two
table), ``jax.lax.psum`` over the data axis reduces the histograms, and
the (replicated) argmax is the next merge — one collective per round,
riding ICI.

The exact host trainer (tiktoken_tpu.train.train_bpe, incremental-update
heap) stays the production path for building vocabularies from scratch;
these primitives are the scalable corpus-statistics path and the
multi-chip "training step" the dry-run exercises.
"""

from __future__ import annotations

import numpy as np

from tiktoken_tpu.parallel.mesh import DATA_AXIS

HIST_BITS = 20  # 1M bins: collision-negligible for early merge rounds


def _pair_hash(a, b, bits: int):
    """uint32 pair hash (same mixer family as ops/pair_table.py)."""
    import jax.numpy as jnp

    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    h = a * np.uint32(0x9E3779B1) ^ (b + np.uint32(0x85EBCA6B) + (a << 6))
    h = h ^ (h >> 15)
    h = h * np.uint32(0x2C1B3C6D)
    h = h ^ (h >> 12)
    return (h & np.uint32((1 << bits) - 1)).astype(jnp.int32)


def make_pair_count_step(mesh, *, axis: str = DATA_AXIS, hist_bits: int = HIST_BITS):
    """Build the jitted distributed pair-count training step.

    Returned fn signature (rows sharded over ``axis``, outputs replicated):
        (tokens [B,K] uint32, alive [B,K] bool, piece_start [B,K] bool)
        -> (hist [2^bits] int32 psum-reduced,
            best_bin int32, best_count int32)

    A pair is counted when both positions are alive, adjacent in the
    skip-list sense is approximated by *currently adjacent alive columns
    within one piece* — exactly the adjacency the merge kernel sees at
    round start (ops/merge.py pair_ranks with identity next pointers).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    n_bins = 1 << hist_bits

    def per_shard(tokens, alive, piece_start):
        B, K = tokens.shape
        # Right neighbour among alive columns: next alive position via a
        # reverse cummax of column indices where alive.
        idx = jnp.arange(K, dtype=jnp.int32)
        # nxt[k] = smallest alive index > k inside the row (K if none).
        alive_idx = jnp.where(alive, idx[None, :], K)
        rev = jnp.flip(alive_idx, axis=1)
        rev_min = jax.lax.associative_scan(jnp.minimum, rev, axis=1)
        nxt_incl = jnp.flip(rev_min, axis=1)  # min alive index >= k
        nxt = jnp.concatenate(
            [nxt_incl[:, 1:], jnp.full((B, 1), K, jnp.int32)], axis=1
        )
        nxt_c = jnp.minimum(nxt, K - 1)
        right = jnp.take_along_axis(tokens, nxt_c, axis=1)
        same_piece = ~jnp.take_along_axis(piece_start, nxt_c, axis=1)
        ok = alive & (nxt < K) & same_piece
        bins = _pair_hash(tokens, right, hist_bits)
        hist = jnp.zeros((n_bins,), jnp.int32).at[
            jnp.where(ok, bins, 0)
        ].add(ok.astype(jnp.int32))
        hist = jax.lax.psum(hist, axis)
        best_bin = jnp.argmax(hist).astype(jnp.int32)
        return hist, best_bin, hist[best_bin]

    row2 = P(axis, None)
    rep = P()
    return jax.jit(
        jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(row2, row2, row2),
            out_specs=(rep, rep, rep),
            check_vma=False,
        )
    )


def corpus_pair_counts(mesh, tokens, alive, piece_start, *, hist_bits: int = HIST_BITS):
    """Host convenience wrapper: shard inputs, run the step, return numpy."""
    import jax

    from tiktoken_tpu.parallel.mesh import batch_sharded

    step = make_pair_count_step(mesh, hist_bits=hist_bits)
    sh = batch_sharded(mesh, rank=2)
    n = mesh.devices.size
    B = tokens.shape[0]
    pad = (-B) % n

    def prep(x, fill):
        x = np.asarray(x)
        if pad:
            x = np.concatenate([x, np.full((pad,) + x.shape[1:], fill, x.dtype)])
        return jax.device_put(x, sh)

    hist, best_bin, best_count = step(
        prep(tokens, 0), prep(alive, False), prep(piece_start, True)
    )
    return np.asarray(hist), int(best_bin), int(best_count)
