"""Streaming scanner transducer: the device form of the split automaton.

The ScannerDFA (ops/regex_compiler.py) defines maximal-munch matching with
backtracking to the last accept — not directly streamable. This module
closes it into a *transducer*: a finite automaton whose state folds in the
bounded rewind buffer, so the device kernel is one table lookup per byte:

    state' = TRANS[state, byte_class]
    bits   = EMIT[state, byte_class]   # bit j => piece starts at pos - j

Construction: breadth-first exploration of reachable (dfa_state, buffer)
pairs, where buffer holds the byte classes consumed since the current
match's last recorded accept end. On death the match resolves: a piece
boundary is emitted at the last accept end and the buffered classes are
re-scanned from the start state (recursively, with strictly shrinking
buffers). The rewind buffer is provably bounded for lexer-style patterns;
exploration asserts the bound instead of trusting it.

End-of-text is a virtual byte class (EOF). Consuming it resolves all
pending boundaries; at a fresh start it is a no-op, so padding and
multi-document packing are expressible in-band.

An ERROR state absorbs byte sequences no piece can start with (only
reachable on invalid UTF-8, which the public API never routes here);
blocks that touch it are flagged for host fallback rather than guessed at.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from tiktoken_tpu.ops.regex_compiler import ScannerDFA

BUF_MAX = 24  # exploration asserts buffers stay below this
EMIT_BITS = 32

_ERROR = ("ERROR",)
_FRESH_BUF: tuple[int, ...] = ()
_FRESH = (0 + 1, _FRESH_BUF, False)  # (ScannerDFA.START, empty buffer, no accept yet)


@dataclass
class ScannerTransducer:
    trans: np.ndarray  # [n_states, n_classes] uint16/uint32
    emit: np.ndarray  # [n_states, n_classes] uint32, bit j => start at pos-j
    class_of: np.ndarray  # [257] byte/EOF -> class
    eof_class: int
    n_states: int
    n_classes: int
    error_state: int  # sticky; reached only on invalid input
    pat_str: str

    START = 0


def build_transducer(dfa: ScannerDFA, *, max_states: int = 400_000) -> ScannerTransducer:
    return _build_transducer_tables(
        dfa.trans, dfa.accept, int(dfa.class_of[256]), dfa.n_classes,
        dfa.class_of, dfa.pat_str, max_states=max_states,
    )


def build_transducer_chars(cdfa, *, max_states: int = 400_000) -> ScannerTransducer:
    """Transducer over a CharScannerDFA (regex_compiler.compile_pattern_chars):
    one table step per CHARACTER, emit offsets in characters. The returned
    transducer's class_of is a dummy (char classes come from the codepoint
    class tables, not a 257-byte map)."""
    import numpy as _np

    dummy = _np.zeros(257, dtype=_np.uint16)
    dummy[256] = cdfa.eof_class
    return _build_transducer_tables(
        cdfa.trans, cdfa.accept, cdfa.eof_class, cdfa.n_classes,
        dummy, cdfa.pat_str, max_states=max_states,
    )


def _build_transducer_tables(dfa_trans, dfa_accept, eof_cls_in, n_classes_in,
                             class_of, pat_str, *, max_states: int = 400_000) -> ScannerTransducer:
    trans_tbl = [list(map(int, row)) for row in dfa_trans]
    acc_tbl = [int(a) for a in dfa_accept]
    eof_cls = eof_cls_in
    n_classes = n_classes_in
    memo: dict = {}

    def consume(state, c: int):
        """Full transducer step: returns (state', emitted offsets).

        A state is (dfa_state, buf, accepted): buf holds the classes since
        the current match's last accept end, and ``accepted`` records
        whether this match has accepted at all — a match dying without any
        accept means its start position cannot begin a piece (invalid
        UTF-8), which is the ERROR state, not a rewind."""
        if state is _ERROR:
            return _ERROR, ()
        key = (state, c)
        got = memo.get(key)
        if got is not None:
            return got
        result = _consume_uncached(state, c)
        memo[key] = result
        return result

    def _consume_uncached(state, c: int):
        s, buf, accepted = state
        s2 = trans_tbl[s][c]
        if s2 != ScannerDFA.DEAD:
            nb = buf + (c,)
            a = acc_tbl[s2]
            if a >= 0:
                if a > len(nb):
                    raise AssertionError(
                        f"accept rewind {a} exceeds buffered {len(nb)} classes"
                    )
                nb = nb[len(nb) - a :] if a else ()
                accepted = True
            if len(nb) > BUF_MAX:
                raise AssertionError(f"rewind buffer exceeded {BUF_MAX}")
            return (s2, nb, accepted), ()
        # Death: the in-flight match resolves at its last accept end.
        if s == ScannerDFA.START and not buf:
            if c == eof_cls:
                return _FRESH, ()  # padding/terminal EOF: no-op
            return _ERROR, ()  # no piece can start with this byte
        if not accepted:
            return _ERROR, ()  # match start was not a valid piece start
        pending = buf + (c,)
        # Piece boundary at last accept end = pos - (len(pending) - 1).
        out = [len(pending) - 1]
        st = _FRESH
        for i, cc in enumerate(pending):
            st, o2 = consume(st, cc)
            if st is _ERROR:
                return _ERROR, ()
            rel = len(pending) - 1 - i
            out.extend(o + rel for o in o2)
        if max(out) >= EMIT_BITS:
            raise AssertionError("emission offset exceeds EMIT_BITS")
        return st, tuple(out)

    # BFS over reachable transducer states.
    start = _FRESH
    ids: dict = {start: 0, _ERROR: 1}
    order = [start, _ERROR]
    rows_trans: list[list[int]] = []
    rows_emit: list[list[int]] = []

    i = 0
    while i < len(order):
        state = order[i]
        trow = [0] * n_classes
        erow = [0] * n_classes
        for c in range(n_classes):
            if state is _ERROR:
                nstate, outs = _ERROR, ()
            else:
                nstate, outs = consume(state, c)
            nid = ids.get(nstate)
            if nid is None:
                nid = len(order)
                ids[nstate] = nid
                order.append(nstate)
            trow[c] = nid
            bits = 0
            for o in outs:
                bits |= 1 << o
            erow[c] = bits
        rows_trans.append(trow)
        rows_emit.append(erow)
        i += 1
        if len(order) > max_states:
            raise RuntimeError(f"transducer exploration exceeded {max_states} states")

    n_states = len(order)
    dtype = np.uint16 if n_states < 2**16 else np.uint32
    td = ScannerTransducer(
        trans=np.asarray(rows_trans, dtype=dtype),
        emit=np.asarray(rows_emit, dtype=np.uint32),
        class_of=np.asarray(class_of).copy(),
        eof_class=eof_cls,
        n_states=n_states,
        n_classes=n_classes,
        error_state=1,
        pat_str=pat_str,
    )
    return minimize_transducer(td)


def minimize_transducer(td: ScannerTransducer) -> ScannerTransducer:
    """Moore minimization over (transition, emission) observations. The
    exploration's buffer states are highly redundant; this typically
    collapses them by an order of magnitude. States 0 (start) and 1
    (error) keep their identities."""
    trans = td.trans.astype(np.int64)
    emit = td.emit.astype(np.int64)
    # Initial partition: by full emission row.
    _, block = np.unique(emit, axis=0, return_inverse=True)
    block = block + 2
    block[td.error_state] = 0  # force error alone? (error emits nothing like
    # many others, but its successor structure separates it in refinement)
    while True:
        sig = np.concatenate([block[:, None], block[trans], emit], axis=1)
        _, new_block = np.unique(sig, axis=0, return_inverse=True)
        done = len(np.unique(new_block)) == len(np.unique(block))
        block = new_block
        if done:
            break
    n_blocks = len(np.unique(block))
    remap = -np.ones(n_blocks, dtype=np.int64)
    if block[0] == block[td.error_state]:
        raise RuntimeError("start state merged with error state")
    remap[block[0]] = 0
    remap[block[td.error_state]] = 1
    nxt_id = 2
    for b in block:
        if remap[b] < 0:
            remap[b] = nxt_id
            nxt_id += 1
    new_ids = remap[block]
    new_n = n_blocks
    reps = np.zeros(new_n, dtype=np.int64)
    reps[new_ids] = np.arange(td.n_states)
    dtype = np.uint16 if new_n < 2**16 else np.uint32
    new_trans = np.zeros((new_n, td.n_classes), dtype=dtype)
    new_emit = np.zeros((new_n, td.n_classes), dtype=np.uint32)
    for b in range(new_n):
        rep = reps[b]
        new_trans[b] = new_ids[trans[rep]]
        new_emit[b] = emit[rep]
    return ScannerTransducer(
        trans=new_trans,
        emit=new_emit,
        class_of=td.class_of,
        eof_class=td.eof_class,
        n_states=new_n,
        n_classes=td.n_classes,
        error_state=1,
        pat_str=td.pat_str,
    )


def scan_transducer_numpy(
    td: ScannerTransducer, classes: np.ndarray
) -> tuple[np.ndarray, bool]:
    """Host reference run of the transducer over one class stream.

    Returns (piece-start bitmask over positions, hit_error). Position 0's
    bit is NOT set by the automaton (the caller knows stream starts)."""
    n = len(classes)
    bits = np.zeros(n, dtype=bool)
    s = ScannerTransducer.START
    trans, emit = td.trans, td.emit
    for p in range(n):
        c = int(classes[p])
        e = int(emit[s, c])
        s = int(trans[s, c])
        while e:
            j = (e & -e).bit_length() - 1
            if p - j >= 0:
                bits[p - j] = True
            e &= e - 1
    return bits, s == td.error_state


def transducer_piece_starts(td: ScannerTransducer, data: bytes) -> list[int]:
    """Piece starts for one document via the transducer (host validation
    path; must agree with regex_compiler.scan_bytes exactly)."""
    if not data:
        return []
    classes = td.class_of[np.frombuffer(data, dtype=np.uint8)]
    stream = np.concatenate([classes, [td.eof_class]])
    bits, err = scan_transducer_numpy(td, stream)
    if err:
        raise ValueError("invalid byte stream (not valid UTF-8 text)")
    starts = [0] + [int(i) for i in np.nonzero(bits[: len(data)])[0] if i != 0]
    return starts
