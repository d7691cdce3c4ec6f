"""v3 handshake pipeline: byte-exact parity with the host oracle across
scripts (the whole point: CJK/Cyrillic documents stay on device without
safe-split rules), cap-overflow retry, and chunk-seam ghosts."""

from __future__ import annotations

import numpy as np
import pytest

from tests.helpers import FULL_TESTS, make_encoding, make_mixed_corpus

CJK = "東京タワーは高い。パリは花の都、そして京都は古都です。春はあけぼの、やうやう白くなりゆく山際。"
CYR = "Широкая электрификация южных губерний даст мощный толчок подъёму сельского хозяйства. Съешь же ещё этих мягких французских булок, да выпей чаю! "
ARABIC = "أهلاً وسهلاً بكم في عالم البرمجة. النص العربي يمتد من اليمين إلى اليسار، وهذا اختبار للمحلل. "


@pytest.fixture(scope="module")
def enc():
    return make_encoding("o200k", 800)


def _check(enc, texts, K=96, chunk_rows=8, expect_no_fallback=False):
    eng = enc.device_engine
    before = eng.stats["fallback_docs"]
    got = eng.encode_corpus3(
        texts, host_fallback=enc._core_bpe, K=K, chunk_rows=chunk_rows
    )
    want = [enc.encode_ordinary(t) for t in texts]
    for i, (a, b) in enumerate(zip(got, want)):
        assert a == b, f"doc {i}: {len(a)} vs {len(b)} tokens"
    if expect_no_fallback:
        assert eng.stats["fallback_docs"] == before, "unexpected host fallback"


def test_mixed_corpus_parity(enc):
    _check(enc, [make_mixed_corpus(4000, seed=s) for s in range(3)])


def test_cjk_stays_on_device(enc):
    # script-agnostic packing: pure-CJK documents must tokenize on the
    # device with zero host fallbacks (VERDICT round-1 missing item #2)
    _check(enc, [CJK * 40, CJK * 3, CJK[:50]], expect_no_fallback=True)


def test_cyrillic_stays_on_device(enc):
    _check(enc, [CYR * 30, CYR], expect_no_fallback=True)


def test_arabic_stays_on_device(enc):
    _check(enc, [ARABIC * 25], expect_no_fallback=True)


def test_whitespace_and_edges(enc):
    _check(enc, [
        "a\n b", "today\n \n", "today\n  \n", " \n\n\n  x", "\t\t\t",
        "", "x", " ", "🌍🌍🌍 emoji soup 🚀", "don't you're it's",
        "word " * 400, ("line\n" * 300) + "tail",
    ])


def test_long_runs_fall_back_exactly(enc):
    # >64-byte pieces cannot merge on device: the doc must still come out
    # byte-exact via the surfaced host fallback
    _check(enc, ["x" * 9000, "ab" + "c" * 500, "0" * 997])


def test_dense_small_pieces_worst_case_retry(enc):
    # "1a1a..." produces one piece per byte: the normal caps overflow and
    # the worst-case variant must absorb it (no doc fallback for caps)
    eng = enc.device_engine
    before = eng.stats["fallback_docs"]
    texts = ["1a" * 600, "? " * 300]
    # module geometry (96, 64): the normal variant's program is shared
    # with the other tests; only the worst-case retry compiles fresh
    got = eng.encode_corpus3(texts, host_fallback=enc._core_bpe, K=96,
                             chunk_rows=8)
    want = [enc.encode_ordinary(t) for t in texts]
    assert got == want
    assert eng.stats["fallback_docs"] == before


def test_chunk_seams_and_geometries(enc):
    # docs span many chunks; odd chunk_rows and K exercise ghost seams
    docs = [make_mixed_corpus(2500, seed=9), CJK * 20,
            make_mixed_corpus(900, seed=10)]
    for K, cr in [(80, 16), (112, 8)] if FULL_TESTS else [(80, 8)]:
        _check(enc, docs, K=K, chunk_rows=cr)


def test_long_vocab_hit_is_reference_semantics():
    # The reference short-circuits on ANY whole-piece vocab hit
    # (src/lib.rs:367-369) — even when merges could never assemble the
    # token. This vocab has an 18-byte token but NO intermediate merges,
    # so a merge-only device path would emit 18 singles; the long vocab
    # table must return the single id, exactly like the host oracle.
    import tiktoken_tpu
    import tiktoken_tpu_ext.openai_public as pub

    ranks = {bytes([b]): b for b in range(256)}
    ranks[b"a" * 18] = 256
    ranks[b"throw" + b"x" * 30 + b"away"] = 257  # 39 bytes, same property
    enc = tiktoken_tpu.Encoding(
        "longhit", pat_str=pub.o200k_pat_str, mergeable_ranks=ranks,
        special_tokens={},
    )
    assert enc.encode_ordinary("a" * 18) == [256]  # host oracle agrees
    texts = ["a" * 18, "throw" + "x" * 30 + "away", "a" * 17, "b" + "a" * 18]
    got = enc.device_engine.encode_corpus3(texts, host_fallback=enc._core_bpe)
    want = [enc.encode_ordinary(t) for t in texts]
    assert got == want
    assert got[0] == [256] and got[1] == [257]


def test_long_vocab_table_build_and_probe():
    from tiktoken_tpu.ops.pieces import (
        build_long_vocab_table,
        long_vocab_hit_numpy,
        MISS,
    )

    ranks = {bytes([b]): b for b in range(256)}
    toks = [b"x" * n for n in range(17, 65)]
    for i, t in enumerate(toks):
        ranks[t] = 256 + i
    lvt = build_long_vocab_table(ranks)
    assert lvt.n_long == len(toks)
    q = np.zeros((len(toks) + 1, 64), np.uint8)
    lens = np.zeros(len(toks) + 1, np.int32)
    for i, t in enumerate(toks):
        q[i, : len(t)] = np.frombuffer(t, np.uint8)
        lens[i] = len(t)
    q[-1, :20] = np.frombuffer(b"y" * 20, np.uint8)  # not in vocab
    lens[-1] = 20
    got = long_vocab_hit_numpy(lvt, q, lens)
    assert list(got[:-1]) == [256 + i for i in range(len(toks))]
    assert got[-1] == MISS


@pytest.mark.skipif(
    not FULL_TESTS,
    reason="multi-minute XLA:CPU compile; kernel-level midcompact parity "
    "(fit + overflow) is covered by "
    "test_pipeline2.py::test_slot_merge_matches_sequential "
    "(set TIKTOKEN_TPU_FULL_TESTS=1 for the end-to-end variant)",
)
def test_midcompact_merge_end_to_end(monkeypatch):
    # the two-phase merge is the TPU default but off on CPU; force it on
    # through the full v3 pipeline and require byte-exact parity
    monkeypatch.setenv("TIKTOKEN_TPU_MERGE_MIDCOMPACT", "1")
    monkeypatch.setenv("TIKTOKEN_TPU_MERGE_MIDCOMPACT_MIN", "8")
    from tiktoken_tpu.ops.engine import DeviceEngine
    from tests.helpers import special_tokens_for, trained_ranks
    import tiktoken_tpu

    ranks = trained_ranks("o200k", 800)
    enc2 = tiktoken_tpu.Encoding(
        "midcompact_t", pat_str=__import__("tests.helpers", fromlist=["pat_str"]).pat_str("o200k"),
        mergeable_ranks=ranks, special_tokens=special_tokens_for(ranks),
    )
    texts = [make_mixed_corpus(1500, seed=11), "打打打 mixed 123456 text!"]
    got = enc2.device_engine.encode_corpus3(
        texts, host_fallback=enc2._core_bpe, K=64, chunk_rows=16
    )
    assert got == [enc2.encode_ordinary(t) for t in texts]


def test_mega_dispatch_groups_and_remainder(enc, monkeypatch):
    # mega-dispatch (TIKTOKEN_TPU_MEGA chunks per jit call via lax.map,
    # amortizing the per-call tunnel roundtrip — HARDWARE.md "dispatch
    # floor"): force m=3 so the chunk count is NOT a multiple of m and
    # the last group is completed by all-empty pad chunks; parity must
    # hold chunk-for-chunk including across the padded group.
    monkeypatch.setenv("TIKTOKEN_TPU_MEGA", "3")
    docs = [make_mixed_corpus(3000, seed=21), CJK * 12, "tail doc 123"]
    _check(enc, docs, K=96, chunk_rows=8)


def test_mega_dispatch_overflow_retry(enc, monkeypatch):
    # a cap-overflowing chunk inside a mega group must re-dispatch alone
    # through the worst-case single-chunk program (pending row index
    # cleared) while its groupmates' results stay valid
    monkeypatch.setenv("TIKTOKEN_TPU_MEGA", "3")
    eng = enc.device_engine
    before = eng.stats["fallback_docs"]
    texts = ["1a" * 600, CJK * 8, "? " * 300]
    got = eng.encode_corpus3(texts, host_fallback=enc._core_bpe, K=96,
                             chunk_rows=8)
    want = [enc.encode_ordinary(t) for t in texts]
    assert got == want
    assert eng.stats["fallback_docs"] == before


def test_encode_corpus_routes_v3(enc):
    got = enc.encode_corpus([CJK * 10, "hello world"], strategy="device",
                            row_capacity=96, chunk_rows=8)
    assert got == [enc.encode_ordinary(CJK * 10),
                   enc.encode_ordinary("hello world")]
