"""Char-class grid + select-sweep scanner: differential tests against the
byte-level DFA scanner (the proven round-1 oracle) and between the numpy
specs and their jax kernels."""

from __future__ import annotations

import numpy as np
import pytest

from .helpers import PAT_NAMES, make_mixed_corpus, pat_str


def _char_tables(pat_name):
    from tiktoken_tpu.ops.charclass import build_char_class_tables
    from tiktoken_tpu.ops.regex_compiler import compile_pattern_chars

    dfa = compile_pattern_chars(pat_str(pat_name))
    return dfa, build_char_class_tables(dfa)


def _byte_oracle_mask(pat_name, row, n_payload, n_total, K):
    """Piece-start mask from the byte-level DFA sequential scan."""
    from tiktoken_tpu.ops.regex_compiler import compile_pattern_cached
    from tiktoken_tpu.ops.window_scan import pack_trans_accept, seq_scan_numpy

    bdfa = compile_pattern_cached(pat_str(pat_name))
    packed = pack_trans_accept(bdfa.trans, bdfa.accept)
    eof_cls = int(bdfa.class_of[256])
    cls_ext = bdfa.class_of[np.concatenate([row.astype(np.int64), [256]])].astype(
        np.int64
    )
    cls_ext[n_total:] = eof_cls
    return seq_scan_numpy(bdfa, packed, cls_ext, n_payload, n_total, K)


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_class_tables_match_dfa(pat_name):
    from tiktoken_tpu.ops.charclass import class_of_cp_tables

    dfa, tables = _char_tables(pat_name)
    rng = np.random.default_rng(0)
    cps = set(rng.integers(0, 0x110000, size=2000).tolist())
    for e in dfa.edges[:-1]:
        cps.update((int(e), max(0, int(e) - 1), min(0x10FFFF, int(e) + 1)))
    for cp in cps:
        assert class_of_cp_tables(tables, cp) == dfa.class_of_cp(cp), hex(cp)
    # EOF class must not collide with any real codepoint class (the scan
    # kernel keys its end-rewind adjustment on it)
    assert not np.any(dfa.seg_class == dfa.eof_class)


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_byte_classes_numpy_spec(pat_name):
    from tiktoken_tpu.ops.charclass import byte_classes_numpy

    dfa, tables = _char_tables(pat_name)
    text = make_mixed_corpus(600, seed=1)
    data = np.frombuffer(text.encode(), dtype=np.uint8)
    n = len(data)
    cls = byte_classes_numpy(tables, data, n)
    # char ends carry the char's class; the lead byte of a multi-byte char
    # is SKIP; interior continuation bytes are CONT
    pos = 0
    for ch in text:
        blen = len(ch.encode())
        if blen > 1:
            assert cls[pos] == tables.skip_class
        for k in range(1, blen - 1):
            assert cls[pos + k] == tables.cont_class
        assert cls[pos + blen - 1] == dfa.class_of_cp(ord(ch))
        pos += blen
    # truncation mid-char never fires a char end
    for cut in range(max(0, n - 12), n):
        cls2 = byte_classes_numpy(tables, data, cut)
        assert np.all(cls2[cut:] == tables.eof_class)
        np.testing.assert_array_equal(cls2[:cut], cls[:cut])
        # positions belonging to a char truncated by the cut must be SKIP
        p2 = 0
        for ch in text:
            blen = len(ch.encode())
            if p2 < cut < p2 + blen:
                # truncated char: no char end fires (SKIP lead, CONT tail)
                assert np.all(cls2[p2:cut] >= tables.skip_class)
            p2 += blen


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_byte_classes_jax_matches_numpy(pat_name):
    from tiktoken_tpu.ops.charclass import (
        byte_classes_numpy,
        make_byte_classes_fn,
        prepare_device_tables,
    )

    import jax.numpy as jnp

    dfa, tables = _char_tables(pat_name)
    # na_frac=2 is the exact-everywhere variant (worst-case retry caps)
    fn = make_byte_classes_fn(tables, na_frac=2)
    prep = prepare_device_tables(tables)
    pp = jnp.asarray(prep["page_planes"])
    mt = jnp.asarray(prep["mixed_t"])

    rng = np.random.default_rng(2)
    L = 96
    rows, totals, want = [], [], []
    corpus = make_mixed_corpus(4000, seed=3).encode()
    for i in range(16):
        off = int(rng.integers(0, len(corpus) - L))
        row = np.frombuffer(corpus[off : off + L], dtype=np.uint8).copy()
        n_total = int(rng.integers(1, L + 1))
        rows.append(row)
        totals.append(n_total)
        want.append(byte_classes_numpy(tables, row, n_total))
    # plus an adversarial row of random bytes (invalid UTF-8 soup)
    row = rng.integers(0, 256, size=L).astype(np.uint8)
    rows.append(row)
    totals.append(L)
    want.append(byte_classes_numpy(tables, row, L))

    got, overflow = fn(
        pp, mt, jnp.asarray(np.stack(rows)), jnp.asarray(np.asarray(totals, np.int32))
    )
    assert not bool(overflow), "na_frac=2 must never overflow"
    got = np.asarray(got)
    for i in range(len(rows)):
        np.testing.assert_array_equal(got[i], want[i], err_msg=f"row {i}")


def test_byte_classes_na_overflow_flags_dense_rows():
    """The common-case variant (na_frac=8) must FLAG rows denser in
    non-ASCII char-ends than its cap (the caller then retries through
    the worst-case variant), and must stay exact when under the cap."""
    from tiktoken_tpu.ops.charclass import (
        byte_classes_numpy,
        make_byte_classes_fn,
        prepare_device_tables,
    )

    import jax.numpy as jnp

    dfa, tables = _char_tables("o200k")
    fn = make_byte_classes_fn(tables, na_frac=8)
    prep = prepare_device_tables(tables)
    pp = jnp.asarray(prep["page_planes"])
    mt = jnp.asarray(prep["mixed_t"])

    L = 96
    cjk = ("東京タワー" * 20).encode()[:L]  # 1 char-end per 3 bytes > L/8 cap
    ascii_row = (b"hello world, plain ascii text! " * 4)[:L]
    rows = np.stack([
        np.frombuffer(cjk, np.uint8),
        np.frombuffer(ascii_row, np.uint8),
    ])
    totals = jnp.asarray(np.asarray([L, L], np.int32))
    got, overflow = fn(pp, mt, jnp.asarray(rows), totals)
    assert bool(overflow), "dense CJK row must set na_overflow"

    got2, overflow2 = fn(
        pp, mt, jnp.asarray(rows[1:]), jnp.asarray(np.asarray([L], np.int32))
    )
    assert not bool(overflow2)
    np.testing.assert_array_equal(
        np.asarray(got2)[0], byte_classes_numpy(tables, rows[1], L)
    )


def _classes_ext_for_row(tables, row, n_total):
    from tiktoken_tpu.ops.charclass import byte_classes_numpy

    cls = byte_classes_numpy(tables, row, n_total)
    return np.concatenate([cls, [tables.eof_class]]).astype(np.int32)


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_char_scan_numpy_matches_byte_oracle(pat_name):
    from tiktoken_tpu.ops.sweep_scan import char_scan_numpy

    dfa, tables = _char_tables(pat_name)
    rng = np.random.default_rng(4)
    corpus = make_mixed_corpus(6000, seed=5).encode()
    LOOK = 16
    K = 64
    KL = K + LOOK
    for trial in range(40):
        off = int(rng.integers(0, len(corpus) - KL))
        row = np.frombuffer(corpus[off : off + KL], dtype=np.uint8).copy()
        n_total = int(rng.integers(1, KL + 1))
        n_payload = max(1, n_total - LOOK) if trial % 3 else n_total
        cls_ext = _classes_ext_for_row(tables, row, n_total)
        got, got_bad = char_scan_numpy(tables, cls_ext, n_payload, n_total, K)
        want, want_bad = _byte_oracle_mask(pat_name, row, n_payload, n_total, K)
        assert got_bad == want_bad, (trial, off)
        if not want_bad:
            np.testing.assert_array_equal(got, want, err_msg=f"trial {trial} off {off}")


def _true_boundaries(pat_name, data: bytes):
    from tiktoken_tpu.ops.regex_compiler import compile_pattern_cached, scan_bytes

    return scan_bytes(compile_pattern_cached(pat_str(pat_name)), data)


@pytest.mark.parametrize("pat_name", PAT_NAMES)
@pytest.mark.parametrize("corpus_kind", ["mixed", "cjk", "digits"])
def test_handshake_chain_reconstructs_document(pat_name, corpus_kind):
    """Speculative-handoff invariant: scanning fixed-size rows cut at
    arbitrary char boundaries, the per-row segments [g, spec_f) chain into
    exactly the document's true piece-start list — or the chain flags bad
    (never silently wrong)."""
    from tiktoken_tpu.ops.charclass import byte_classes_numpy
    from tiktoken_tpu.ops.sweep_scan import handshake_scan_numpy

    dfa, tables = _char_tables(pat_name)
    if corpus_kind == "mixed":
        data = make_mixed_corpus(1200, seed=11).encode()
    elif corpus_kind == "cjk":
        data = ("東京タワーは高い。パリは花の都、そして京都は古都です。" * 14).encode()
    else:
        data = ("12345678901234567890" * 40).encode()  # phase-locked runs
    K, FWD = 96, 80
    KL = K + FWD
    true_bounds = _true_boundaries(pat_name, data)

    # pack: rows every K bytes, cut back to a char boundary
    cuts = [0]
    while cuts[-1] < len(data):
        c = min(cuts[-1] + K, len(data))
        if c < len(data):
            while data[c] & 0xC0 == 0x80:
                c -= 1
        assert c > cuts[-1]
        cuts.append(c)

    got_bounds = []
    any_bad = False
    prev_f_abs = 0
    for r in range(len(cuts) - 1):
        o = cuts[r]
        n_payload = cuts[r + 1] - o
        row = np.zeros(KL, np.uint8)
        n_total = min(len(data) - o, KL)
        row[:n_total] = np.frombuffer(data[o : o + n_total], np.uint8)
        is_doc_end = (o + n_total) == len(data)
        cls = byte_classes_numpy(tables, row, n_total)
        cls_ext = np.concatenate([cls, [tables.eof_class]]).astype(np.int32)
        mask, spec_f, bad = handshake_scan_numpy(
            tables, cls_ext, n_payload, n_total, is_doc_end, K
        )
        if bad:
            any_bad = True
            break
        if r == 0:
            g = 0
        else:
            g = prev_f_abs - o
            assert 0 <= g < K
            if not (g == n_payload or mask[g]):
                any_bad = True  # handoff mismatch: doc falls back
                break
        got_bounds.extend(o + j for j in np.nonzero(mask)[0] if j >= g)
        prev_f_abs = o + spec_f
    if not any_bad:
        assert prev_f_abs == len(data)
        assert got_bounds == true_bounds, corpus_kind
    else:
        # fallback is acceptable only for genuinely unresolvable packs
        # (phase-locked digit runs); normal scripts must stay on device
        assert corpus_kind == "digits"


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_handshake_jax_matches_numpy(pat_name):
    import jax
    import jax.numpy as jnp

    from tiktoken_tpu.ops.sweep_scan import (
        handshake_scan_numpy,
        make_char_scan_fn,
    )

    dfa, tables = _char_tables(pat_name)
    rng = np.random.default_rng(9)
    corpus = make_mixed_corpus(8000, seed=13).encode()
    K, FWD = 48, 40
    KL = K + FWD
    fn = jax.jit(make_char_scan_fn(tables, KL, K, handshake=True))

    rows, payloads, totals, ends = [], [], [], []
    for _ in range(24):
        off = int(rng.integers(0, len(corpus) - KL))
        row = np.frombuffer(corpus[off : off + KL], dtype=np.uint8).copy()
        n_total = int(rng.integers(0, KL + 1))
        n_payload = int(rng.integers(0, max(1, min(n_total, K)) + 1))
        rows.append(row)
        payloads.append(n_payload)
        totals.append(n_total)
        ends.append(bool(rng.integers(0, 2)))

    cls_ext = np.stack([
        _classes_ext_for_row(tables, r, t) for r, t in zip(rows, totals)
    ])
    gm, gf, gb = fn(
        jnp.asarray(cls_ext),
        jnp.asarray(np.asarray(payloads, np.int32)),
        jnp.asarray(np.asarray(totals, np.int32)),
        jnp.asarray(np.asarray(ends, bool)),
    )
    gm, gf, gb = np.asarray(gm), np.asarray(gf), np.asarray(gb)
    for i in range(len(rows)):
        wm, wf, wb = handshake_scan_numpy(
            tables, cls_ext[i], payloads[i], totals[i], ends[i], K
        )
        assert bool(gb[i]) == wb, i
        if not wb:
            assert int(gf[i]) == wf, i
            np.testing.assert_array_equal(gm[i], wm, err_msg=f"row {i}")


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_char_scan_jax_matches_numpy(pat_name):
    import jax
    import jax.numpy as jnp

    from tiktoken_tpu.ops.sweep_scan import char_scan_numpy, make_char_scan_fn

    dfa, tables = _char_tables(pat_name)
    rng = np.random.default_rng(6)
    corpus = make_mixed_corpus(8000, seed=7).encode()
    K, LOOK = 48, 16
    KL = K + LOOK
    fn = jax.jit(make_char_scan_fn(tables, KL, K))

    rows, payloads, totals = [], [], []
    for _ in range(24):
        off = int(rng.integers(0, len(corpus) - KL))
        row = np.frombuffer(corpus[off : off + KL], dtype=np.uint8).copy()
        n_total = int(rng.integers(0, KL + 1))
        n_payload = int(rng.integers(0, max(1, n_total - 4) + 1))
        rows.append(row)
        payloads.append(n_payload)
        totals.append(n_total)

    cls_ext = np.stack([
        _classes_ext_for_row(tables, r, t) for r, t in zip(rows, totals)
    ])
    got_mask, got_bad = fn(
        jnp.asarray(cls_ext),
        jnp.asarray(np.asarray(payloads, np.int32)),
        jnp.asarray(np.asarray(totals, np.int32)),
    )
    got_mask, got_bad = np.asarray(got_mask), np.asarray(got_bad)
    for i in range(len(rows)):
        want, want_bad = char_scan_numpy(
            tables, cls_ext[i], payloads[i], totals[i], K
        )
        assert bool(got_bad[i]) == want_bad, i
        np.testing.assert_array_equal(got_mask[i], want, err_msg=f"row {i}")
