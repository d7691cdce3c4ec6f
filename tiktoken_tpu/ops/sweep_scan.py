"""Char-level maximal-munch scanner as a pure VPU select-sweep kernel.

The round-1 sequential scanner (ops/window_scan.make_seq_scan_fn) walks
the byte-level DFA with two chained dynamic gathers per byte-step — the
random-access wall (HARDWARE.md: ~100-125M lookups/s) caps it near
40 MB/s. This kernel removes every dynamic gather from the loop:

- It steps the tiny *char-level* DFA (<= 21 states x 24 classes,
  ops/regex_compiler.compile_pattern_chars) over per-byte char classes
  precomputed by ops/charclass (char class at each character's final
  byte, SKIP inside multi-byte characters, EOF past end-of-text).
- The transition table is baked into the compiled program as ~130
  compile-time scalar constants; a lookup is a two-stage where-select
  sweep (state row -> packed word -> byte), all VPU elementwise ops.
- The row's class stream is packed four-classes-per-word; the current
  class is read by a select sweep over the row's words — again no
  gather, because the word list is a static unrolled axis.
- Piece-start boundaries accumulate into per-row bitmask words via
  compare+shift ORs (no scatter).

Measured chain rate for the transition sweep alone: ~300M steps/s at
32k lanes (vs ~10M effective for the gather scanner), i.e. the scan
stage moves from ~35-45 ms/MB to ~2-4 ms/MB.

Semantics are the reference's find_iter maximal munch (reference:
src/lib.rs:363-365): repeatedly run the DFA from the piece start,
remember the last accept (with char-level lookahead rewind <= 1,
asserted at table build), and on death restart at that accept end.
Byte-position bookkeeping: an accept with rewind 0 ends at the current
char's final byte + 1; rewind 1 ends at the current char's first byte
(`cs`), or at the text end when the consumed symbol is EOF.
"""

from __future__ import annotations

import numpy as np

from tiktoken_tpu.ops.charclass import CharClassTables
from tiktoken_tpu.ops.regex_compiler import CharScannerDFA

DEAD = CharScannerDFA.DEAD
START = CharScannerDFA.START

FIRE_BIT = 1 << 5
REW_BIT = 1 << 6


def resolve_unroll(explicit, env_name: str, tpu_default: int, cpu_default: int) -> int:
    """Loop-unroll depth for the current backend.

    Deep unrolls divide the per-iteration while_loop floor on the TPU
    backend (HARDWARE.md) but multiply XLA:CPU compile time enough to
    blow any timeout (the round-2 multichip gate failed on exactly this),
    so the CPU backend gets shallow bodies unless the env var overrides.
    """
    import os

    v = os.environ.get(env_name)
    if v:
        return int(v)
    if explicit is not None:
        return explicit
    import jax

    return cpu_default if jax.default_backend() == "cpu" else tpu_default


def build_scan_consts(tables: CharClassTables) -> np.ndarray:
    """[S, NW] uint32: per state, the packed per-class step values
    (4 classes per word, 8 bits each):

        val = next_state | fired << 5 | rewind << 6

    ``fired`` is set when the transition lands in a live accepting state
    (the scan records a new last-accept end); ``rewind`` is the accept's
    char-level lookahead (0 or 1). The SKIP column (class == n_classes)
    is the identity: state unchanged, nothing fires."""
    S = tables.n_states
    C = tables.n_classes
    NC = C + 2  # + SKIP + CONT
    trans, accept = tables.trans, tables.accept
    assert int(accept.max()) <= 1, "char rewind must be <= 1"
    vals = np.zeros((S, NC), dtype=np.uint32)
    for s in range(S):
        for c in range(C):
            nxt = int(trans[s, c])
            a = int(accept[nxt])
            fired = 1 if (nxt != DEAD and a >= 0) else 0
            rew = a if (fired and a > 0) else 0
            vals[s, c] = nxt | (fired << 5) | (rew << 6)
        vals[s, C] = s  # SKIP: hold state silently
        vals[s, C + 1] = s  # CONT: ditto (mid-char death handled in-step)
    assert int(vals.max()) < 256
    n_words = (NC + 3) // 4
    words = np.zeros((S, n_words), dtype=np.uint32)
    for s in range(S):
        for c in range(NC):
            words[s, c >> 2] |= vals[s, c] << ((c & 3) * 8)
    return words


# ---------------------------------------------------------------------------
# numpy reference (the spec for the jax kernel)
# ---------------------------------------------------------------------------


def char_scan_numpy(
    tables: CharClassTables,
    classes_ext: np.ndarray,
    n_payload: int,
    n_total: int,
    K: int,
) -> tuple[np.ndarray, bool]:
    """One row. classes_ext [KL+1] int32 with EOF at >= n_total and in the
    final column. Returns (piece_start mask [K] bool, bad)."""
    consts = build_scan_consts(tables)
    SKIP = tables.skip_class
    CONTC = tables.cont_class
    EOFC = tables.eof_class
    KL = len(classes_ext) - 1
    mask = np.zeros(K, dtype=bool)
    bad = False
    if n_payload <= 0:
        return mask, bad
    p, s, mstart, lend, cs = 0, START, 0, -1, 0
    for _ in range(3 * (KL + 2)):
        c = int(classes_ext[min(p, KL)])
        v = int(consts[s, c >> 2] >> ((c & 3) * 8)) & 0xFF
        s2 = v & 31
        if v & FIRE_BIT:
            if v & REW_BIT:
                lend = p if c == EOFC else cs
            else:
                lend = p + 1
        # CONT at a match start: the match begins on a continuation byte —
        # the byte DFA dies immediately there, so force the same
        # death/no-progress outcome
        died = (s2 == DEAD) or (p >= n_total) or (c == CONTC and p == mstart)
        if died:
            if mstart < n_payload and mstart < K:
                mask[mstart] = True
            no_prog = lend <= mstart
            finished = lend >= n_payload
            if no_prog and not finished:
                bad = True
                break
            if finished or no_prog:
                break
            p, s, mstart, cs, lend = lend, START, lend, lend, -1
        else:
            if c < SKIP:  # char-end byte consumed (SKIP/CONT hold state)
                cs = p + 1
            p += 1
            s = s2
    else:
        bad = True
    return mask, bad


def handshake_scan_numpy(
    tables: CharClassTables,
    classes_ext: np.ndarray,
    n_payload: int,
    n_total: int,
    is_doc_end: bool,
    K: int,
) -> tuple[np.ndarray, int, bool]:
    """One row, speculative-handoff contract (pipeline3).

    The scan starts at offset 0 (speculatively — the row may begin
    mid-piece) and runs until its first boundary at or past ``n_payload``
    (``spec_f``, the handoff the next row validates against; analog of
    the reference's last_piece_token_len boundary bookkeeping, reference:
    src/lib.rs:439-441). Returns (piece_start mask [K] for starts <
    n_payload, spec_f, bad). ``bad`` additionally fires when resolution
    consumed the end-of-buffer EOF on a row that is NOT the end of its
    document (the straddling piece ran past the FWD margin, or a
    whitespace-run accept used the fake EOF): such a row's handoff is
    untrustworthy and its document falls back."""
    consts = build_scan_consts(tables)
    SKIP = tables.skip_class
    CONTC = tables.cont_class
    EOFC = tables.eof_class
    KL = len(classes_ext) - 1
    mask = np.zeros(K, dtype=bool)
    bad = False
    spec_f = n_payload
    if n_payload <= 0:
        return mask, 0, False
    p, s, mstart, lend, cs = 0, START, 0, -1, 0
    for _ in range(3 * (KL + 2)):
        c = int(classes_ext[min(p, KL)])
        v = int(consts[s, c >> 2] >> ((c & 3) * 8)) & 0xFF
        s2 = v & 31
        if v & FIRE_BIT:
            if v & REW_BIT:
                lend = p if c == EOFC else cs
            else:
                lend = p + 1
        eof_death = p >= n_total
        died = (s2 == DEAD) or eof_death or (c == CONTC and p == mstart)
        if died:
            if eof_death and not is_doc_end:
                bad = True  # unresolved straddler / fake-EOF resolution
            if mstart < n_payload and mstart < K:
                mask[mstart] = True
            no_prog = lend <= mstart
            finished = lend >= n_payload
            if no_prog and not finished:
                bad = True
                break
            if bad:
                break  # eof-bad: freeze without capturing spec_f (kernel parity)
            if finished or no_prog:
                spec_f = lend
                break
            p, s, mstart, cs, lend = lend, START, lend, lend, -1
        else:
            if c < SKIP:
                cs = p + 1
            p += 1
            s = s2
    else:
        bad = True
    return mask, int(spec_f), bad


# ---------------------------------------------------------------------------
# jax kernel
# ---------------------------------------------------------------------------


def make_char_scan_fn(tables: CharClassTables, KL: int, K: int, *,
                      unroll: int | None = None, handshake: bool = False):
    """jit-able: (classes_ext [B, KL+1] i32, n_payload [B] i32,
    n_total [B] i32) -> (piece_start [B, K] bool, row_bad [B] bool).

    With ``handshake=True`` (pipeline3), the signature gains an
    ``is_doc_end [B] bool`` input and the result a ``spec_f [B] i32``
    (the speculative-handoff boundary; see handshake_scan_numpy):
    (classes_ext, n_payload, n_total, is_doc_end)
    -> (piece_start [B, K], spec_f [B], row_bad [B]).

    Drop-in boundary-scan replacement for window_scan.make_seq_scan_fn
    (same output contract), fed by charclass.make_byte_classes_fn instead
    of raw bytes."""
    import jax
    import jax.numpy as jnp

    # deep unroll divides the per-iteration loop floor on TPU; shallow
    # bodies keep XLA:CPU compiles inside any reasonable timeout
    unroll = resolve_unroll(unroll, "TIKTOKEN_TPU_SCAN_UNROLL", 24, 4)

    consts = build_scan_consts(tables)
    S, NW = consts.shape
    ROW = [[int(consts[s, w]) for w in range(NW)] for s in range(S)]
    SKIP = tables.skip_class
    CONTC = tables.cont_class
    EOFC = tables.eof_class
    KW = (K + 31) // 32
    NPAD = (-(KL + 1)) % 4
    NPW = (KL + 1 + NPAD) // 4

    import os

    # Select-network lowering: "butterfly" (default) resolves both
    # per-substep lookups in log depth — the linear where-chains issue
    # S*NW+NW ~ 154 + NPW ~ 77 serial VPU ops per substep and the
    # per-op issue cost (~0.3 us, HARDWARE.md) dominates at chunk-sized
    # lane counts; the butterfly needs ~15 serial ops for the same
    # element work. "linear" keeps the round-2 chains for A/B.
    select_mode = os.environ.get("TIKTOKEN_TPU_SCAN_SELECT", "butterfly")

    NW2 = 1 << max(1, (NW - 1).bit_length())  # word axis, pow2-padded
    S2 = 1 << max(1, (S - 1).bit_length())  # state axis, pow2-padded
    NPW2 = 1 << max(1, (NPW - 1).bit_length())  # class-word axis

    def scan(classes_ext, n_payload, n_total, is_doc_end=None):
        B = classes_ext.shape[0]
        cls_p = classes_ext.astype(jnp.uint32)
        if NPAD:
            cls_p = jnp.concatenate(
                [cls_p, jnp.full((B, NPAD), EOFC, jnp.uint32)], axis=1
            )
        cw = cls_p.reshape(B, NPW, 4)
        packed = cw[:, :, 0] | (cw[:, :, 1] << 8) | (cw[:, :, 2] << 16) | (
            cw[:, :, 3] << 24
        )
        cls_cols = [packed[:, w] for w in range(NPW)]
        if NPW2 > NPW:
            packed_p = jnp.concatenate(
                [packed, jnp.zeros((B, NPW2 - NPW), jnp.uint32)], axis=1
            )
        else:
            packed_p = packed
        # transition table as a device constant [S, NW2] (padding words
        # are never selected: real class indices stay < NC <= 4*NW)
        tbl = np.zeros((S, NW2), np.uint32)
        tbl[:, :NW] = consts
        CT = jnp.asarray(tbl)

        def read_class_linear(p):
            pi = jnp.minimum(p, KL)
            wi = pi >> 2
            w = jnp.zeros((B,), jnp.uint32)
            for k in range(NPW):
                w = jnp.where(wi == k, cls_cols[k], w)
            return ((w >> ((pi & 3).astype(jnp.uint32) << 3)) & 0xFF).astype(
                jnp.int32
            )

        def read_class_butterfly(p):
            pi = jnp.minimum(p, KL)
            wi = pi >> 2
            cur = packed_p
            k = NPW2.bit_length() - 2
            while cur.shape[1] > 1:
                half = cur.shape[1] // 2
                bit = ((wi >> k) & 1).astype(bool)[:, None]
                cur = jnp.where(bit, cur[:, half:], cur[:, :half])
                k -= 1
            w = cur[:, 0]
            return ((w >> ((pi & 3).astype(jnp.uint32) << 3)) & 0xFF).astype(
                jnp.int32
            )

        def trans_lookup_linear(s, c):
            # stage 1: the state's NW packed row words
            words = []
            for w in range(NW):
                acc = jnp.zeros((B,), jnp.uint32)
                for st in range(S):
                    acc = jnp.where(s == st, jnp.uint32(ROW[st][w]), acc)
                words.append(acc)
            # stage 2: word by class >> 2, then byte by class & 3
            wi = c >> 2
            wsel = jnp.zeros((B,), jnp.uint32)
            for w in range(NW):
                wsel = jnp.where(wi == w, words[w], wsel)
            return ((wsel >> ((c & 3).astype(jnp.uint32) << 3)) & 0xFF).astype(
                jnp.int32
            )

        def trans_lookup_butterfly(s, c):
            # word by class>>2 over the constant [S, NW2] (keeps the
            # narrow real state count through the wide rounds) ...
            wc = (c >> 2).astype(jnp.uint32)
            cur = jnp.broadcast_to(CT[None], (B, S, NW2))
            k = NW2.bit_length() - 2
            while cur.shape[2] > 1:
                half = cur.shape[2] // 2
                bit = ((wc >> k) & 1).astype(bool)[:, None, None]
                cur = jnp.where(bit, cur[:, :, half:], cur[:, :, :half])
                k -= 1
            col = cur[:, :, 0]  # [B, S]
            # ... then state over the pow2-padded column
            if S2 > S:
                col = jnp.concatenate(
                    [col, jnp.zeros((B, S2 - S), jnp.uint32)], axis=1
                )
            su = s.astype(jnp.uint32)
            k = S2.bit_length() - 2
            while col.shape[1] > 1:
                half = col.shape[1] // 2
                bit = ((su >> k) & 1).astype(bool)[:, None]
                col = jnp.where(bit, col[:, half:], col[:, :half])
                k -= 1
            w = col[:, 0]
            return ((w >> ((c & 3).astype(jnp.uint32) << 3)) & 0xFF).astype(
                jnp.int32
            )

        if select_mode == "linear":
            read_class, trans_lookup = read_class_linear, trans_lookup_linear
        else:
            read_class, trans_lookup = (
                read_class_butterfly, trans_lookup_butterfly,
            )

        def substep(p, s, mstart, lend, cs, done, bad, mw, f):
            active = ~(done | bad)
            c = read_class(p)
            v = trans_lookup(s, c)
            s2 = v & 31
            fired = (v & FIRE_BIT) != 0
            rew1 = (v & REW_BIT) != 0
            end_rew = jnp.where(c == EOFC, p, cs)
            lend = jnp.where(
                fired & active, jnp.where(rew1, end_rew, p + 1), lend
            )
            # CONT at a match start = match begins on a continuation byte:
            # force the byte DFA's immediate-death outcome (char_scan_numpy)
            died = (s2 == DEAD) | (p >= n_total) | ((c == CONTC) & (p == mstart))

            emit = died & active & (mstart < n_payload)
            bit = jnp.where(
                emit,
                jnp.uint32(1) << (mstart.astype(jnp.uint32) & 31),
                jnp.uint32(0),
            )
            wsel = mstart >> 5
            mw = [mw[j] | jnp.where(wsel == j, bit, jnp.uint32(0)) for j in range(KW)]

            no_prog = died & (lend <= mstart)
            new_start = jnp.where(died, lend, mstart)
            finished = new_start >= n_payload
            bad = bad | (no_prog & active & ~finished)
            if handshake:
                # death that consumed the buffer EOF mid-document: the
                # straddler/handoff is unresolved (handshake_scan_numpy)
                eof_bad = died & active & (p >= n_total) & ~is_doc_end
                bad = bad | eof_bad
                fin = died & (finished | no_prog) & active & ~eof_bad
                f = jnp.where(fin, lend, f)
            done = done | (died & (finished | no_prog) & active)

            adv = active & ~died
            p2 = jnp.where(adv, p + 1, jnp.where(active, lend, p))
            s3 = jnp.where(adv, s2, START)
            cs2 = jnp.where(
                adv, jnp.where(c < SKIP, p + 1, cs), jnp.where(active, lend, cs)
            )
            mstart2 = jnp.where(active & died, lend, mstart)
            lend2 = jnp.where(active & died, -1, lend)
            return p2, s3, mstart2, lend2, cs2, done, bad, mw, f

        def cond(st):
            done, bad, it = st[5], st[6], st[9]
            return (~(done | bad)).any() & (it < 3 * (KL + 2))

        def body(st):
            p, s, mstart, lend, cs, done, bad, mw, f, it = st
            for _ in range(unroll):
                p, s, mstart, lend, cs, done, bad, mw, f = substep(
                    p, s, mstart, lend, cs, done, bad, mw, f
                )
            return (p, s, mstart, lend, cs, done, bad, mw, f, it + unroll)

        z = jnp.zeros((B,), jnp.int32)
        st = (
            z,
            jnp.full((B,), START, jnp.int32),
            z,
            jnp.full((B,), -1, jnp.int32),
            z,
            n_payload <= 0,
            jnp.zeros((B,), bool),
            [jnp.zeros((B,), jnp.uint32) for _ in range(KW)],
            jnp.maximum(n_payload, 0),
            jnp.int32(0),
        )
        st = jax.lax.while_loop(cond, body, st)
        done, bad, mw, f = st[5], st[6], st[7], st[8]
        bad = bad | ~done
        words = jnp.stack(mw, axis=1)  # [B, KW]
        bits = (
            (words[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)[None, None, :])
            & 1
        ).astype(bool)
        mask = bits.reshape(B, KW * 32)[:, :K]
        if handshake:
            return mask, jnp.where(n_payload <= 0, 0, f), bad
        return mask, bad

    return scan
