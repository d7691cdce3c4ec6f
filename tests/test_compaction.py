"""Scatter-free routing primitives: jax vs numpy spec fuzz, including
adversarial density patterns (routing collisions would corrupt values)."""

from __future__ import annotations

import numpy as np
import pytest

from tiktoken_tpu.ops.compaction import (
    compact,
    compact_numpy,
    expand,
    expand_numpy,
)


def _rng_masks(rng, n):
    kind = rng.integers(0, 5)
    if kind == 0:
        return rng.random(n) < rng.random()  # uniform density
    if kind == 1:
        return np.arange(n) % int(rng.integers(1, 5)) == 0  # periodic
    if kind == 2:
        m = np.zeros(n, bool)
        m[: int(rng.integers(0, n + 1))] = True  # prefix block
        return m
    if kind == 3:
        m = np.zeros(n, bool)
        m[int(rng.integers(0, n)) :] = True  # suffix block
        return m
    return rng.random(n) < 0.02  # sparse


@pytest.mark.parametrize("n,out", [(64, 64), (64, 16), (256, 128), (100, 100)])
def test_compact_flat_fuzz(n, out):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(n * 1000 + out)
    fn = jax.jit(lambda v, a, b: compact(v, [a, b], out))
    for _ in range(12):
        valid = _rng_masks(rng, n)
        a = rng.integers(0, 2**31, size=n).astype(np.int32)
        b = rng.integers(0, 2**16, size=n).astype(np.uint32)
        (ga, gb), gcnt = fn(jnp.asarray(valid), jnp.asarray(a), jnp.asarray(b))
        (wa, wb), wcnt = compact_numpy(valid, [a, b], out)
        assert int(gcnt) == int(wcnt)
        k = min(int(wcnt), out)
        np.testing.assert_array_equal(np.asarray(ga)[:k], wa[:k])
        np.testing.assert_array_equal(np.asarray(gb)[:k], wb[:k])


def test_compact_batched_rows():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    B, n, out = 9, 64, 32
    valid = rng.random((B, n)) < 0.3
    a = rng.integers(0, 2**20, size=(B, n)).astype(np.int32)
    (ga,), gcnt = jax.jit(lambda v, a: compact(v, [a], out))(
        jnp.asarray(valid), jnp.asarray(a)
    )
    (wa,), wcnt = compact_numpy(valid, [a], out)
    np.testing.assert_array_equal(np.asarray(gcnt), wcnt)
    for i in range(B):
        k = min(int(wcnt[i]), out)
        np.testing.assert_array_equal(np.asarray(ga)[i, :k], wa[i, :k])


@pytest.mark.parametrize("n,out", [(32, 64), (64, 64), (64, 200), (128, 96)])
def test_expand_fuzz(n, out):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(n * 31 + out)
    fn = jax.jit(lambda c, a, b: expand(c, [a, b], out))
    for trial in range(12):
        counts = rng.integers(0, 5, size=n).astype(np.int32)
        counts[rng.random(n) < 0.5] = 0  # plenty of empty anchors
        if trial == 0:
            counts[:] = 1  # adjacent displacement stress (all shifts)
        if trial == 1:
            counts[:] = 0
            counts[-1] = 3
        a = rng.integers(0, 2**20, size=n).astype(np.int32)
        b = rng.integers(0, 2**16, size=n).astype(np.uint32)
        (ga, gb), gk, gv, gt = fn(
            jnp.asarray(counts), jnp.asarray(a), jnp.asarray(b)
        )
        (wa, wb), wk, wv, wt = expand_numpy(counts, [a, b], out)
        assert int(gt) == wt
        gv = np.asarray(gv)
        np.testing.assert_array_equal(gv, wv)
        np.testing.assert_array_equal(np.asarray(ga)[gv], wa[wv])
        np.testing.assert_array_equal(np.asarray(gb)[gv], wb[wv])
        np.testing.assert_array_equal(np.asarray(gk)[gv], wk[wv])
