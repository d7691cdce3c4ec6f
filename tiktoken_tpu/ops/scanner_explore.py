"""Vectorized transducer exploration.

Semantics identical to the scalar `consume` in ops/scanner.py, but all
frontier states process one byte class simultaneously in numpy, which
copes with the multi-million raw state spaces of cl100k/o200k (the raw
space collapses by ~10x under Moore minimization afterwards, but it has
to be enumerated first).

Core trick: when a match dies, the classes to re-scan (rewind buffer +
current class) are exactly the most recently consumed items — so death
resolution is "rewind the read pointer, reset to the fresh state", a
bounded vectorized loop, no recursion. Each death's restart position
strictly advances, so the loop is bounded by ~2x the queue length.

State row encoding (structure-of-arrays):
    s       int32   DFA state (1 = START)
    acc     bool    has this match accepted at least once
    blen    int8    rewind buffer length
    buf     uint8[BUF_MAX]  classes since last accept end
Plus the distinguished ERROR row (all-invalid marker).
"""

from __future__ import annotations

import numpy as np

from tiktoken_tpu.ops.regex_compiler import ScannerDFA
from tiktoken_tpu.ops.scanner import BUF_MAX, EMIT_BITS, ScannerTransducer, minimize_transducer


def _batch_consume(
    trans: np.ndarray,  # [S, C] int32 DFA transitions (0 dead)
    accept: np.ndarray,  # [S] int8 rewind or -1
    eof_cls: int,
    s: np.ndarray,
    acc: np.ndarray,
    blen: np.ndarray,
    buf: np.ndarray,
    c: np.ndarray,  # [N] class consumed by each row
):
    """One transducer step for N rows. Returns
    (s', acc', blen', buf', emit_bits [N] uint16, is_error [N] bool)."""
    N = len(s)
    QLEN = BUF_MAX + 1
    # Queue: the classes that may need re-scanning = buf ++ [c].
    queue = np.zeros((N, QLEN), dtype=np.int32)
    queue[:, :BUF_MAX] = buf
    queue[np.arange(N), blen] = c
    qtotal = blen.astype(np.int32) + 1  # valid queue items
    # Offset of queue[i] relative to the current position: i - blen.

    cur_s = s.astype(np.int32).copy()
    cur_acc = acc.copy()
    cur_blen = blen.astype(np.int32).copy()
    # start-of-current-match pointer into the queue (for rewinds):
    # the current match consumed queue[0:blen] already; conceptually its
    # buffer lives at queue[head - cur_blen : head].
    head = blen.astype(np.int32).copy()  # next queue index to consume
    emit = np.zeros(N, dtype=np.uint32)
    error = np.zeros(N, dtype=bool)
    active = np.ones(N, dtype=bool)

    START = ScannerDFA.START
    max_iters = 4 * QLEN + 4
    for _ in range(max_iters):
        run = active & (head < qtotal) & ~error
        if not run.any():
            break
        idx = np.nonzero(run)[0]
        cc = queue[idx, head[idx]]
        s2 = trans[cur_s[idx], cc]
        dead = s2 == 0

        # --- alive rows: consume, maybe accept-truncate ---
        alive_i = idx[~dead]
        if len(alive_i):
            s2a = s2[~dead]
            a = accept[s2a].astype(np.int32)
            new_len = cur_blen[alive_i] + 1
            took = a >= 0
            new_len = np.where(took, a, new_len)
            if (new_len > BUF_MAX).any():
                raise AssertionError("rewind buffer exceeded BUF_MAX")
            cur_s[alive_i] = s2a
            cur_acc[alive_i] |= took
            cur_blen[alive_i] = new_len
            head[alive_i] += 1

        # --- dead rows: resolve ---
        dead_i = idx[dead]
        if len(dead_i):
            fresh_empty = (cur_s[dead_i] == START) & (cur_blen[dead_i] == 0)
            is_eof = queue[dead_i, head[dead_i]] == eof_cls
            # fresh+EOF: no-op consume
            noop = fresh_empty & is_eof
            ni = dead_i[noop]
            head[ni] += 1  # consume the EOF silently
            # fresh+non-EOF or never-accepted: error
            err = (fresh_empty & ~is_eof) | (~fresh_empty & ~cur_acc[dead_i])
            error[dead_i[err]] = True
            # proper death: emit boundary at match's last accept end and
            # rewind the queue pointer over the buffered classes.
            res = ~noop & ~err
            ri = dead_i[res]
            if len(ri):
                # boundary offset relative to current position:
                # current position = offset of queue[head] = head - blen0
                # where blen0 is the ORIGINAL blen (offset base). Current
                # consumed-position offset = head[ri] - blen[ri]... the
                # boundary sits at the start of the buffered classes:
                # queue index head - cur_blen => offset (head - cur_blen) - blen0
                off = (qtotal[ri] - 1) - (head[ri] - cur_blen[ri])
                if (off < 0).any() or (off >= EMIT_BITS).any():
                    raise AssertionError("emission offset out of range")
                emit[ri] |= (np.uint32(1) << off.astype(np.uint32)).astype(np.uint32)
                head[ri] -= cur_blen[ri]  # re-scan buffered classes
                cur_s[ri] = START
                cur_acc[ri] = False
                cur_blen[ri] = 0
    else:
        if (active & (head < qtotal) & ~error).any():
            raise AssertionError("death-resolution loop did not converge")

    # Rebuild buffers: the final buffer = last cur_blen consumed classes =
    # queue[head - cur_blen : head].
    out_buf = np.zeros((N, BUF_MAX), dtype=np.uint8)
    maxlen = int(cur_blen.max(initial=0))
    for j in range(maxlen):
        sel = cur_blen > j
        src = head[sel] - cur_blen[sel] + j
        out_buf[sel, j] = queue[sel, src]
    return (
        cur_s.astype(np.int32),
        cur_acc,
        cur_blen.astype(np.int8),
        out_buf,
        emit.astype(np.uint16),
        error,
    )


def build_transducer_vectorized(
    dfa: ScannerDFA, *, max_states: int = 6_000_000
) -> ScannerTransducer:
    trans = dfa.trans.astype(np.int32)
    accept = dfa.accept.astype(np.int8)
    eof_cls = int(dfa.class_of[256])
    n_classes = dfa.n_classes

    # State interning: key = (s, acc, blen, buf) packed into bytes.
    def pack(s, acc, blen, buf):
        key = np.zeros((len(s), 7 + BUF_MAX), dtype=np.uint8)
        key[:, 0:4] = s.astype(np.uint32).view(np.uint8).reshape(-1, 4)
        key[:, 4] = acc
        key[:, 5] = blen
        key[:, 7:] = buf
        return key

    # id 0 = fresh start, id 1 = ERROR (handled out of band)
    fresh_key = pack(
        np.asarray([ScannerDFA.START], dtype=np.int32),
        np.zeros(1, bool),
        np.zeros(1, np.int8),
        np.zeros((1, BUF_MAX), np.uint8),
    )[0]
    interned: dict[bytes, int] = {fresh_key.tobytes(): 0}
    states_s = [ScannerDFA.START]
    states_acc = [False]
    states_blen = [0]
    states_buf = [np.zeros(BUF_MAX, np.uint8)]

    trans_rows: list[np.ndarray] = []
    emit_rows: list[np.ndarray] = []

    CHUNK = 40_000  # frontier rows processed per batch (memory bound)
    frontier_start = 0
    while frontier_start < len(states_s):
        lo = frontier_start
        hi = min(len(states_s), lo + CHUNK)
        frontier_start = hi
        fs = np.asarray(states_s[lo:hi], dtype=np.int32)
        facc = np.asarray(states_acc[lo:hi], dtype=bool)
        fblen = np.asarray(states_blen[lo:hi], dtype=np.int8)
        fbuf = np.stack(states_buf[lo:hi])
        n_f = hi - lo
        layer_emit = np.zeros((n_f, n_classes), dtype=np.uint16)
        all_keys = np.zeros((n_classes, n_f, 7 + BUF_MAX), dtype=np.uint8)
        all_err = np.zeros((n_classes, n_f), dtype=bool)
        all_state_data = []

        for c in range(n_classes):
            cs, cacc, cblen, cbuf, cem, cerr = _batch_consume(
                trans, accept, eof_cls, fs, facc, fblen, fbuf,
                np.full(n_f, c, dtype=np.int32),
            )
            keys_c = pack(cs, cacc, cblen, cbuf)
            keys_c[cerr] = fresh_key  # neutralize: error rows are patched to id 1 below
            all_keys[c] = keys_c
            all_err[c] = cerr
            all_state_data.append((cs, cacc, cblen, cbuf))
            layer_emit[:, c] = cem

        # Batch interning: unique keys in this layer, then one dict probe
        # per *unique* key only.
        flat_keys = all_keys.reshape(n_classes * n_f, 7 + BUF_MAX)
        uniq, inverse = np.unique(flat_keys, axis=0, return_inverse=True)
        uniq_ids = np.empty(len(uniq), dtype=np.int64)
        # locate one representative (class, row) per unique key
        rep = np.zeros(len(uniq), dtype=np.int64)
        rep[inverse] = np.arange(n_classes * n_f)
        for u in range(len(uniq)):
            kb = uniq[u].tobytes()
            got = interned.get(kb)
            if got is None:
                got = len(states_s) + 1  # +1 for the ERROR slot
                interned[kb] = got
                flat_i = rep[u]
                c_i, r_i = divmod(int(flat_i), n_f)
                cs, cacc, cblen, cbuf = all_state_data[c_i]
                states_s.append(int(cs[r_i]))
                states_acc.append(bool(cacc[r_i]))
                states_blen.append(int(cblen[r_i]))
                states_buf.append(cbuf[r_i].copy())
            uniq_ids[u] = got
        layer_trans = uniq_ids[inverse].reshape(n_classes, n_f).T.copy()
        err_t = all_err.reshape(n_classes, n_f).T
        layer_trans[err_t] = 1
        trans_rows.append(layer_trans)
        emit_rows.append(layer_emit)
        if len(states_s) > max_states:
            raise RuntimeError(f"transducer exploration exceeded {max_states} states")

    # Assemble: state ids are 0 (fresh) then 1 (error) then the rest; the
    # intern map above already numbers rows with the error offset applied,
    # except the fresh row itself is id 0.
    n_states = len(states_s) + 1
    all_trans = np.concatenate(trans_rows, axis=0)
    all_emit = np.concatenate(emit_rows, axis=0)
    dtype = np.uint16 if n_states < 2**16 else np.uint32
    trans_tbl = np.zeros((n_states, n_classes), dtype=dtype)
    emit_tbl = np.zeros((n_states, n_classes), dtype=np.uint16)
    # row order: explored row i corresponds to state id (0 if i==0 else i+1)
    trans_tbl[0] = all_trans[0]
    emit_tbl[0] = all_emit[0]
    trans_tbl[1] = 1  # ERROR: sticky
    if len(states_s) > 1:
        trans_tbl[2:] = all_trans[1:]
        emit_tbl[2:] = all_emit[1:]

    td = ScannerTransducer(
        trans=trans_tbl,
        emit=emit_tbl,
        class_of=dfa.class_of.copy(),
        eof_class=eof_cls,
        n_states=n_states,
        n_classes=n_classes,
        error_state=1,
        pat_str=dfa.pat_str,
    )
    return minimize_transducer(td)
