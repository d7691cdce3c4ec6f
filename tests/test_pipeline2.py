"""Piece-slot pipeline (v2): unit specs + end-to-end parity.

Every jax stage has a numpy reference in its module; these tests pin
jax == numpy == host-oracle equality, then the whole v2 pipeline against
the reference library, mirroring the repo's differential-oracle pattern.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from .helpers import (
    FULL_TESTS,
    MAX_EXAMPLES,
    DEVICE_PAT_NAMES,
    make_encoding,
    make_mixed_corpus,
    make_oracle,
    trained_ranks,
)

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


def test_vocab_table_hits_every_short_token():
    from tiktoken_tpu.ops.pieces import SLOT, build_vocab_table, pack_token, vocab_hit_numpy

    ranks = trained_ranks("cl100k")
    vt = build_vocab_table(ranks)
    toks = [(t, r) for t, r in ranks.items() if 2 <= len(t) <= SLOT]
    words = np.stack([pack_token(t) for t, _ in toks])
    lens = np.asarray([len(t) for t, _ in toks], dtype=np.int32)
    got = vocab_hit_numpy(vt, words, lens)
    want = np.asarray([r for _, r in toks], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)
    # non-tokens miss
    from tiktoken_tpu.ops.pieces import MISS

    bad = np.stack([pack_token(b"\xff\xfe\xfd"), pack_token(b"zzzzqqqq")])
    bl = np.asarray([3, 8], dtype=np.int32)
    miss = vocab_hit_numpy(vt, bad, bl)
    for t, m in zip([b"\xff\xfe\xfd", b"zzzzqqqq"], miss):
        assert (t in ranks) == (m != MISS)


def test_catalog_and_extract_jax_match_numpy():
    import jax

    from tiktoken_tpu.ops.pieces import (
        catalog_numpy,
        extract_numpy,
        make_catalog_fn,
        make_extract_fn,
    )

    rng = np.random.default_rng(0)
    B, K = 4, 64
    rows = rng.integers(32, 127, (B, K)).astype(np.uint8)
    piece_start = rng.random((B, K)) < 0.25
    piece_start[:, 0] = True
    n_payload = np.asarray([K, K - 5, 30, 0], dtype=np.int32)
    piece_start &= np.arange(K)[None, :] < n_payload[:, None]
    p_cap = 128

    starts_np, lens_np, n_np = catalog_numpy(piece_start, n_payload, p_cap)
    cat = jax.jit(make_catalog_fn(B, K, p_cap))
    starts_j, lens_j, n_j, _pid = cat(piece_start, n_payload)
    assert int(n_j) == n_np
    np.testing.assert_array_equal(np.asarray(starts_j), starts_np)
    np.testing.assert_array_equal(np.asarray(lens_j), lens_np)

    words_np = extract_numpy(rows, starts_np, lens_np)
    ext = jax.jit(make_extract_fn(B, K, p_cap))
    words_j = ext(rows, starts_j, lens_j)
    np.testing.assert_array_equal(np.asarray(words_j), words_np)


@pytest.mark.parametrize("W", [16, 64])
def test_slot_merge_matches_sequential(W):
    import jax

    from tiktoken_tpu._pybpe import byte_pair_encode
    from tiktoken_tpu.ops.engine import _cached_pair_table
    from tiktoken_tpu.ops.slot_merge import make_slot_merge_fn, slot_merge_numpy

    ranks = trained_ranks("o200k")
    table = _cached_pair_table(ranks)
    rng = np.random.default_rng(1)
    corpus = make_mixed_corpus(4000, seed=5).encode()

    pieces = []
    for _ in range(64):
        ln = int(rng.integers(1, W + 1))
        s = int(rng.integers(0, len(corpus) - ln))
        pieces.append(corpus[s : s + ln])
    M = len(pieces)
    slot = np.zeros((M, W), dtype=np.uint8)
    lens = np.zeros(M, dtype=np.int32)
    for i, p in enumerate(pieces):
        slot[i, : len(p)] = np.frombuffer(p, np.uint8)
        lens[i] = len(p)

    tok_np, alive_np = slot_merge_numpy(table, slot, lens)
    for i, p in enumerate(pieces):
        got = [int(t) for t in tok_np[i][alive_np[i]]]
        assert got == byte_pair_encode(p, ranks), p

    fn = jax.jit(make_slot_merge_fn(table.seed, table.n_buckets, W))
    tok_j, alive_j, _rounds = fn(
        table.buckets, table.byte_to_rank, slot, lens
    )
    np.testing.assert_array_equal(np.asarray(alive_j), alive_np)
    np.testing.assert_array_equal(
        np.asarray(tok_j)[alive_np], tok_np[alive_np]
    )

    # two-phase (mid-loop compaction) variant: same results, both when
    # the survivors fit the M/4 pool and when they overflow it (the
    # lax.cond fallback re-runs the full arena)
    fn2 = jax.jit(
        make_slot_merge_fn(
            table.seed, table.n_buckets, W, midcompact=True, midcompact_min=8
        )
    )
    tok_c, alive_c, _r = fn2(table.buckets, table.byte_to_rank, slot, lens)
    np.testing.assert_array_equal(np.asarray(alive_c), alive_np)
    np.testing.assert_array_equal(
        np.asarray(tok_c)[alive_np], tok_np[alive_np]
    )
    # overflow path: every piece identical and long -> all survive phase 1
    hard = np.tile(np.frombuffer(b"abcdefghijklmnop"[:W][: min(W, 16)], np.uint8),
                   (M, 1))
    slot_h = np.zeros((M, W), dtype=np.uint8)
    slot_h[:, : hard.shape[1]] = hard
    lens_h = np.full(M, hard.shape[1], np.int32)
    tok_hn, alive_hn = slot_merge_numpy(table, slot_h, lens_h)
    tok_hj, alive_hj, _r2 = fn2(table.buckets, table.byte_to_rank, slot_h, lens_h)
    np.testing.assert_array_equal(np.asarray(alive_hj), alive_hn)
    np.testing.assert_array_equal(
        np.asarray(tok_hj)[alive_hn], tok_hn[alive_hn]
    )


@pytest.mark.parametrize("pat_name", DEVICE_PAT_NAMES)
def test_v2_corpus_matches_reference(pat_name):
    enc = make_encoding(pat_name)
    oracle = make_oracle(pat_name)
    docs = [make_mixed_corpus(4000, seed=s) for s in range(3)] + [
        "", "x", "hello world!", "a\nb\r\nc  d", "0" * 40, "x" * 50,
        "ab" * 30, "    indented\n\tcode();\n", "🌍🚀" * 10,
    ]
    before = enc.device_engine.stats["v1_fallback_chunks"]
    got = enc.encode_corpus(docs, strategy="device")
    want = [oracle.encode_ordinary(d) for d in docs]
    for d, g, w in zip(docs, got, want):
        assert g == w, d[:60]
    # benign docs must not trip the v1 fallback (stats are cumulative on
    # the session-cached Encoding, so compare the delta)
    assert enc.device_engine.stats["v1_fallback_chunks"] == before


@pytest.mark.parametrize("pat_name", ["o200k"])
@settings(max_examples=MAX_EXAMPLES // 2, deadline=None)
@given(text=st.text(max_size=300))
def test_v2_fuzz(pat_name, text):
    enc = make_encoding(pat_name)
    oracle = make_oracle(pat_name)
    got = enc.encode_corpus([text], row_capacity=128, strategy="device")
    assert got == [oracle.encode_ordinary(text)]


def test_v2_long_pieces_fall_back_per_row():
    """Pieces longer than LONG_SLOT flag their rows for host fallback."""
    enc = make_encoding("o200k")
    oracle = make_oracle("o200k")
    doc = "x" * 500 + " normal words here\nand more"
    got = enc.encode_corpus([doc], row_capacity=256, strategy="device")
    assert got == [oracle.encode_ordinary(doc)]


@pytest.mark.parametrize("strategy", ["hybrid", "device", "host", "auto"])
def test_encode_corpus_strategies_byte_exact(strategy):
    """Every scheduling strategy must produce identical tokens (the hybrid
    two-worker path is forced explicitly: 'auto' resolves to host-only on
    single-core machines like CI)."""
    enc = make_encoding("o200k")
    oracle = make_oracle("o200k")
    docs = [make_mixed_corpus(2500, seed=s) for s in range(6)] + ["", "x y"]
    got = enc.encode_corpus(docs, strategy=strategy)
    assert got == [oracle.encode_ordinary(d) for d in docs], strategy


def test_large_single_document_device():
    """A multi-chunk single document: fragments reassemble in order across
    chunk boundaries (doc-level assembly path). The fast tier pins the
    small chunk tier so the doc still spans many chunks without
    compiling the production geometry on XLA:CPU (542 s measured); the
    full tier runs the 1.5 MB document through the default tiers."""
    enc = make_encoding("o200k")
    oracle = make_oracle("o200k")
    if FULL_TESTS:
        doc = make_mixed_corpus(1_500_000, seed=11)
        got = enc.encode_corpus([doc], strategy="device")
    else:
        doc = make_mixed_corpus(120_000, seed=11)
        got = enc.encode_corpus([doc], strategy="device", chunk_rows=128)
    assert got == [oracle.encode_ordinary(doc)]
