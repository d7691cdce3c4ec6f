"""Window-scan pre-tokenizer: a dependency-free device splitter.

The reference's regex scan is sequential (each match starts where the
previous one ended; reference: src/lib.rs:363-365). The window scan breaks
the dependency in two stages, both embarrassingly parallel:

1. **Match-end function.** For every byte position p, run the compiled
   scanner DFA (ops/regex_compiler.py) forward for up to W bytes,
   tracking the last accept (with its lookahead rewind). This yields
   E[p] = the exact end of the match that would start at p — for any
   match that resolves within the window — as a small relative hop
   (1..W), plus an "unresolved" flag for the rare piece longer than the
   window. Per position this is W table lookups; there is no cross-
   position dependency at all, so it maps perfectly onto the VPU.

2. **Boundary chain.** The piece starts of a row are the orbit of 0
   under E: {0, E[0], E[E[0]], ...}. Computed in log2(K) rounds of
   pointer doubling over the hop array (hop'[p] = hop[p] + hop[p+hop[p]]
   with an on-orbit mask), entirely with gathers.

Unresolved positions on the orbit are handled by re-running flagged rows
with a wider window; beyond that, host fallback. Correctness does not
depend on the window size — only completeness of device resolution does.
"""

from __future__ import annotations

import numpy as np

from tiktoken_tpu.ops.regex_compiler import ScannerDFA

DEFAULT_WINDOW = 48


# ---------------------------------------------------------------------------
# Reference implementation (numpy, one row) — the spec for the jax kernel.
# ---------------------------------------------------------------------------


def match_ends_numpy(
    dfa: ScannerDFA, classes: np.ndarray, window: int
) -> tuple[np.ndarray, np.ndarray]:
    """E[p] (relative hop, 0 if no match/invalid) and unresolved[p] for
    every start position, scanning at most ``window`` classes. ``classes``
    must already contain the EOF class at end-of-text positions."""
    n = len(classes)
    trans = dfa.trans.astype(np.int64)
    accept = dfa.accept.astype(np.int64)
    state = np.full(n, ScannerDFA.START, dtype=np.int64)
    hop = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    for o in range(window):
        cls = np.empty(n, dtype=np.int64)
        if o < n:
            cls[: n - o] = classes[o:]
        cls[max(0, n - o) :] = classes[-1]  # trailing EOF padding
        state = np.where(alive, trans[state, cls], state)
        alive &= state != ScannerDFA.DEAD
        a = accept[state]
        took = alive & (a >= 0)
        hop = np.where(took, o + 1 - a, hop)
    unresolved = alive  # still alive after the window: match may extend
    return hop, unresolved


def piece_starts_numpy(dfa: ScannerDFA, data: bytes, window: int = DEFAULT_WINDOW) -> list[int]:
    """Host validation path: must agree with regex_compiler.scan_bytes."""
    if not data:
        return []
    classes = np.concatenate(
        [
            dfa.class_of[np.frombuffer(data, dtype=np.uint8)].astype(np.int64),
            [int(dfa.class_of[256])],
        ]
    )
    w = window
    while True:
        hop, unresolved = match_ends_numpy(dfa, classes, w)
        starts = []
        p = 0
        ok = True
        while p < len(data):
            starts.append(p)
            if unresolved[p]:
                ok = False
                break
            if hop[p] <= 0:
                raise ValueError(f"no match at offset {p}: invalid input")
            p += int(hop[p])
        if ok:
            return starts
        if w >= len(classes) + 2:
            raise RuntimeError("window covers whole text but match unresolved")
        w = min(w * 4, len(classes) + 2)


# ---------------------------------------------------------------------------
# JAX device implementation
# ---------------------------------------------------------------------------


def make_window_scan_fn(window: int, n_states: int, n_classes: int):
    """Jittable fn: (trans [S,C] int32, accept [S] int32,
    classes [B, K+W] int32) -> (hop [B,K] int32, unresolved [B,K] bool).

    classes must include W extra lookahead columns (EOF-padded)."""
    import jax
    import jax.numpy as jnp

    def scan(trans, accept, classes):
        B = classes.shape[0]
        K = classes.shape[1] - window
        flat_trans = trans.reshape(-1)  # [S*C]
        state = jnp.full((B, K), ScannerDFA.START, dtype=jnp.int32)
        hop = jnp.zeros((B, K), dtype=jnp.int32)
        alive = jnp.ones((B, K), dtype=bool)
        for o in range(window):
            cls = jax.lax.dynamic_slice_in_dim(classes, o, K, axis=1)
            nxt = flat_trans[state * n_classes + cls]
            state = jnp.where(alive, nxt, state)
            alive = alive & (state != ScannerDFA.DEAD)
            a = accept[state]
            took = alive & (a >= 0)
            hop = jnp.where(took, o + 1 - a, hop)
        return hop, alive

    import jax

    return scan


def make_orbit_fn(K: int):
    """Jittable fn: (hop [B,K] int32, valid_len [B] int32)
    -> piece_start mask [B,K] bool (position 0 always set).

    Pointer doubling over relative hops: after round t, jump[p] = the
    orbit position 2^t steps ahead of p (saturating at K). The orbit mask
    accumulates by propagating reachability from position 0."""
    import jax.numpy as jnp

    def orbit(hop, valid_len):
        B = hop.shape[0]
        idx = jnp.arange(K, dtype=jnp.int32)
        row = jnp.arange(B, dtype=jnp.int32)[:, None]
        # hop <= 0 (dead/invalid) saturates to K to avoid self-loops
        jump = jnp.where(hop > 0, jnp.minimum(idx[None, :] + hop, K), K)
        mask = jnp.zeros((B, K), dtype=bool).at[:, 0].set(True)
        steps = 1
        while steps < K:
            # mark jump-images of current orbit members
            tgt = jnp.minimum(jump, K - 1)
            add = jnp.zeros((B, K), dtype=bool).at[row, tgt].max(mask & (jump < K))
            mask = mask | add
            # double: jump'[p] = jump[jump[p]] (K stays K)
            jump_pad = jnp.concatenate(
                [jump, jnp.full((B, 1), K, dtype=jump.dtype)], axis=1
            )
            jump = jnp.take_along_axis(jump_pad, jnp.minimum(jump, K), axis=1)
            steps *= 2
        mask = mask & (idx[None, :] < valid_len[:, None])
        return mask

    return orbit
