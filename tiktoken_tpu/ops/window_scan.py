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


ACC_BITS = 5  # accept rewind in [-1, MAX_REWIND=15] -> 5 bits


def pack_trans_accept(trans: np.ndarray, accept: np.ndarray) -> np.ndarray:
    """Fuse the two per-step table lookups into one: packed[s, c] =
    next_state << 5 | (accept[next_state] + 1). Random access is the
    scarce resource (HARDWARE.md), so one gather per scanned byte instead
    of two."""
    nxt = trans.astype(np.int64)
    a = accept.astype(np.int64)[nxt] + 1
    assert a.min() >= 0 and a.max() < (1 << ACC_BITS)
    packed = (nxt << ACC_BITS) | a
    assert packed.max() < 2**31
    return packed.astype(np.int32)


def make_window_scan_fn(window: int, n_states: int, n_classes: int,
                        *, first_window: int = 16):
    """Jittable fn: (packed [S,C] int32 (pack_trans_accept),
    classes [B, K+W] int32) -> (hop [B,K] int32, unresolved [B,K] bool).

    classes must include W extra lookahead columns (EOF-padded).

    Two-phase: every position scans ``first_window`` bytes; the (few)
    positions whose match did not resolve are compacted and re-scanned
    with the full window, so the per-byte gather count is ~first_window
    plus a small tail instead of ``window``."""
    import jax
    import jax.numpy as jnp

    W1 = min(first_window, window)

    def scan(packed, classes):
        B = classes.shape[0]
        K = classes.shape[1] - window
        N = B * K
        flat = packed.reshape(-1)  # [S*C]
        acc_mask = (1 << ACC_BITS) - 1

        def step(state, hop, alive, cls, o):
            """One DFA step at absolute window offset o."""
            v = flat[state * n_classes + cls]
            nxt = v >> ACC_BITS
            state = jnp.where(alive, nxt, state)
            alive = alive & (state != ScannerDFA.DEAD)
            a = (v & acc_mask) - 1
            took = alive & (a >= 0)
            hop = jnp.where(took, o + 1 - a, hop)
            return state, hop, alive

        state = jnp.full((B, K), ScannerDFA.START, dtype=jnp.int32)
        hop = jnp.zeros((B, K), dtype=jnp.int32)
        alive = jnp.ones((B, K), dtype=bool)
        for o in range(W1):
            cls = jax.lax.dynamic_slice_in_dim(classes, o, K, axis=1)
            state, hop, alive = step(state, hop, alive, cls, o)
        if W1 >= window:
            return hop, alive

        # Phase 2: the few positions whose match spans more than W1 bytes
        # continue on a compacted grid (measured 0.3% at W1=16 on mixed
        # text). Compaction overflow (degenerate input: most positions
        # inside >W1-byte matches) marks everything unresolved so callers
        # fall back safely.
        u_cap = max(128, N // 32)
        flat_alive = alive.reshape(-1)
        u_overflow = jnp.sum(flat_alive.astype(jnp.int32)) > u_cap
        upos = jnp.nonzero(flat_alive, size=u_cap, fill_value=0)[0]
        urow = upos // K
        ucol = upos % K
        cls_flat = classes.reshape(-1)
        ubase = urow * classes.shape[1] + ucol
        ustate = state.reshape(-1)[upos]
        uhop = jnp.zeros((u_cap,), jnp.int32)
        ualive = flat_alive[upos]
        u_took_any = jnp.zeros((u_cap,), bool)
        for o in range(W1, window):
            cls = cls_flat[ubase + o]
            prev_hop = uhop
            ustate, uhop, ualive = step(ustate, uhop, ualive, cls, o)
            u_took_any = u_took_any | (uhop != prev_hop)

        hop_flat = hop.reshape(-1)
        # Later accepts override earlier ones (maximal munch: the final
        # recorded accept wins, exactly as in the single-sweep semantics).
        new_hop = jnp.where(u_took_any, uhop, hop_flat[upos])
        # Duplicate indices (the fill positions) write identical values.
        hop_flat = hop_flat.at[upos].set(new_hop)
        unresolved = jnp.zeros((N,), bool).at[upos].max(ualive)
        unresolved = unresolved | u_overflow
        return hop_flat.reshape(B, K), unresolved.reshape(B, K)

    return scan


def make_orbit_fn(K: int):
    """Sequential orbit: piece starts are the chain 0, f(0), f(f(0)), ...
    where f(p) = p + hop[p]. Rows advance in lockstep, one chain step per
    while_loop iteration ([B]-lane gather + scatter, ~10us each), so the
    cost scales with the PIECE count (~K/4.5 iterations), not with
    log2(K) full-grid gather rounds like pointer doubling (~40x cheaper
    at 2048-byte rows; HARDWARE.md random-access economics)."""
    import jax
    import jax.numpy as jnp

    def orbit(hop, valid_len):
        B = hop.shape[0]
        rowsi = jnp.arange(B, dtype=jnp.int32)

        def cond(st):
            _mask, _cur, done = st
            return ~done.all()

        def body(st):
            mask, cur, done = st
            mask = mask.at[rowsi, jnp.where(done, 0, cur)].max(~done)
            h = hop[rowsi, jnp.minimum(cur, K - 1)]
            # hop <= 0 (dead/invalid position): stop the chain, matching
            # the saturating semantics of the doubling formulation; the
            # pipeline flags such rows via piece_start & (hop <= 0).
            nxt = jnp.where(h > 0, cur + h, K)
            done = done | (nxt >= valid_len)
            return mask, jnp.minimum(nxt, K - 1), done

        mask0 = jnp.zeros((B, K), dtype=bool)
        cur0 = jnp.zeros((B,), jnp.int32)
        done0 = valid_len <= 0
        mask, _cur, _done = jax.lax.while_loop(cond, body, (mask0, cur0, done0))
        return mask

    return orbit


def make_orbit_doubling_fn(K: int):
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


# ---------------------------------------------------------------------------
# Sequential scanner: the reference's maximal-munch loop, vectorized over
# row lanes. One while_loop iteration consumes one byte per row (plus one
# restart iteration per piece), so the total work is ~1.25 steps/byte of
# [B]-lane gathers instead of the window scan's W lookups per byte. Rows
# advance independently; the loop runs until every row's scan completes.
# Replaces window-scan + orbit in one pass (reference: src/lib.rs:363-365
# find_iter semantics; host spec: regex_compiler.scan_classes).
# ---------------------------------------------------------------------------


def expand_packed_to_bytes(packed: np.ndarray, class_of: np.ndarray) -> np.ndarray:
    """[S, 257] byte-indexed transition table (column 256 = EOF): lets the
    sequential scanner skip the per-step class gather — the byte value
    indexes the table directly (one fewer random access per byte)."""
    return np.ascontiguousarray(packed[:, class_of.astype(np.int64)])


def make_seq_scan_fn(KL: int, K: int, n_classes: int, eof_cls: int):
    """jit-able: (packed [S,C] i32 (pack_trans_accept),
    classes_ext [B, KL+1] i32 (EOF at >= n_total and in column KL),
    n_payload [B] i32, n_total [B] i32)
    -> (piece_start [B,K] bool, row_bad [B] bool).

    ``n_classes`` may be 257 with a byte-indexed table from
    :func:`expand_packed_to_bytes` and ``classes_ext`` = raw bytes with
    256 injected at end-of-text."""
    import jax
    import jax.numpy as jnp

    acc_mask = (1 << ACC_BITS) - 1
    START = ScannerDFA.START
    DEAD = ScannerDFA.DEAD

    UNROLL = 1  # steps per while_loop iteration (unrolling measured no win)

    def scan(packed, classes_ext, n_payload, n_total):
        B = classes_ext.shape[0]
        flat_t = packed.reshape(-1)
        cls_flat = classes_ext.reshape(-1)
        row_base = jnp.arange(B, dtype=jnp.int32) * (KL + 1)
        rows_i = jnp.arange(B, dtype=jnp.int32)

        def cond(st):
            it = st[-2]
            return (~st[-1].all()) & (it < 3 * (KL + 2))

        row_k = rows_i * K

        def substep(p, s, mstart, lend, mask, bad, done, n_payload, n_total):
            cls = cls_flat[row_base + jnp.minimum(p, KL)]
            v = flat_t[s * n_classes + cls]
            s2 = (v >> ACC_BITS).astype(jnp.int32)
            a = (v & acc_mask) - 1
            consumed_eof = p >= n_total  # this step read the EOF sentinel
            fired = (s2 != DEAD) & (a >= 0)
            lend2 = jnp.where(fired, p + 1 - a, lend)
            died = (s2 == DEAD) | consumed_eof

            # death: resolve the in-flight match at its last accept end
            # (1-D scatter: 2-D index scatters lower much slower)
            no_progress = died & (lend2 <= mstart)
            new_start = jnp.where(died, lend2, mstart)
            col = jnp.where(done | ~died, 0, jnp.minimum(jnp.maximum(mstart, 0), K - 1))
            mask = mask.at[row_k + col].max(died & ~done & (mstart < n_payload))
            finished = new_start >= n_payload
            p2 = jnp.where(died, lend2, p + 1)
            s3 = jnp.where(died, START, s2)
            lend3 = jnp.where(died, jnp.int32(-1), lend2)
            bad = bad | (no_progress & ~done & ~finished)
            done2 = done | (died & (finished | no_progress))
            p2 = jnp.where(done2, p, p2)
            return (
                p2.astype(jnp.int32), s3.astype(jnp.int32),
                new_start.astype(jnp.int32), lend3.astype(jnp.int32),
                mask, bad, done2,
            )

        def body(st):
            p, s, mstart, lend, mask, bad, it, done = st
            for _ in range(UNROLL):
                p, s, mstart, lend, mask, bad, done = substep(
                    p, s, mstart, lend, mask, bad, done, n_payload, n_total
                )
            return p, s, mstart, lend, mask, bad, it + UNROLL, done

        p0 = jnp.zeros((B,), jnp.int32)
        s0 = jnp.full((B,), START, jnp.int32)
        ms0 = jnp.zeros((B,), jnp.int32)
        le0 = jnp.full((B,), -1, jnp.int32)
        mask0 = jnp.zeros((B * K,), bool)
        bad0 = jnp.zeros((B,), bool)
        done0 = n_payload <= 0
        # first piece start (position 0) is marked by the first death's
        # mstart=0 emission
        st = jax.lax.while_loop(
            cond, body, (p0, s0, ms0, le0, mask0, bad0, jnp.int32(0), done0)
        )
        mask, bad, done = st[4], st[5], st[7]
        # safety-bound exhaustion (cannot happen on valid input): flag rows
        bad = bad | ~done
        return mask.reshape(B, K), bad

    return scan


def seq_scan_numpy(dfa: ScannerDFA, packed, classes_ext, n_payload, n_total, K):
    """numpy spec of make_seq_scan_fn for one row (validation)."""
    import numpy as _np

    cls = classes_ext
    n = int(n_payload)
    starts = []
    bad = False
    if n > 0:
        i = 0
        while i < n:
            starts.append(i)
            s = ScannerDFA.START
            last_end = -1
            p = i
            while True:
                c = int(cls[min(p, len(cls) - 1)])
                v = int(packed.reshape(-1)[s * dfa.n_classes + c])
                s = v >> ACC_BITS
                a = (v & ((1 << ACC_BITS) - 1)) - 1
                if s != ScannerDFA.DEAD and a >= 0:
                    last_end = p + 1 - a
                if s == ScannerDFA.DEAD or p >= int(n_total):
                    break
                p += 1
            if last_end <= i:
                bad = True
                break
            i = last_end
    mask = _np.zeros(K, bool)
    for st in starts:
        if st < K:
            mask[st] = True
    return mask, bad
