"""API-surface behaviour: special-token policy matrix, offsets, pickle,
model mapping, registry, and constructor invariants.

Mirrors the reference's policy matrix (reference:
tests/test_encoding.py:175-223), offsets tests (tests/test_offsets.py) and
misc tests (tests/test_misc.py), running on locally-trained vocabularies.
"""

from __future__ import annotations

import pickle

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import tiktoken_tpu

from .helpers import MAX_EXAMPLES, PAT_NAMES, make_encoding, make_oracle


# ---------------------------------------------------------------------------
# Special-token policy matrix
# ---------------------------------------------------------------------------


def test_special_token_policy_matrix():
    enc = make_encoding("cl100k")
    eot = "<|endoftext|>"
    text = f"hello {eot}"

    with pytest.raises(ValueError):
        enc.encode(text)
    with pytest.raises(ValueError):
        enc.encode(text, disallowed_special="all")
    with pytest.raises(ValueError):
        enc.encode(text, disallowed_special={eot})

    tokens_allowed = enc.encode(text, allowed_special={eot})
    assert tokens_allowed[-1] == enc.encode_single_token(eot)
    assert enc.encode(text, allowed_special="all") == tokens_allowed

    # allowed yet also explicitly disallowed: disallowed wins, raises.
    with pytest.raises(ValueError):
        enc.encode(text, allowed_special={eot}, disallowed_special={eot})

    # With the check disabled, special text encodes as ordinary text.
    assert enc.encode(text, disallowed_special=()) == enc.encode_ordinary(text)

    # Other specials: allowed_special for one token doesn't allow others.
    text2 = f"{eot}<|im_start|>"
    with pytest.raises(ValueError):
        enc.encode(text2, allowed_special={eot})
    ok = enc.encode(text2, allowed_special={eot}, disallowed_special=())
    assert ok[0] == enc.encode_single_token(eot)


def test_disallowed_error_message_is_actionable():
    enc = make_encoding("cl100k")
    with pytest.raises(ValueError, match="disallowed special token"):
        enc.encode("<|endoftext|>")


@pytest.mark.parametrize("pat_name", PAT_NAMES)
@settings(max_examples=MAX_EXAMPLES // 2, deadline=None)
@given(text=st.text(max_size=60))
def test_ordinary_equals_encode_without_specials(pat_name, text):
    enc = make_encoding(pat_name)
    assert enc.encode_ordinary(text) == enc.encode(text, disallowed_special=())


# ---------------------------------------------------------------------------
# Offsets
# ---------------------------------------------------------------------------


def _token_offsets_reference(enc, tokens: list[int]) -> list[int]:
    """Slow-but-obviously-correct oracle: offset of token i is the length of
    the longest decoded prefix that is a strict prefix in characters
    (reference: tests/test_offsets.py:19-25)."""
    text = enc.decode(tokens, errors="strict")
    offsets = []
    for i in range(len(tokens)):
        prefix = enc.decode_bytes(tokens[:i])
        offsets.append(min(len(text) - 1, len(prefix.decode("utf-8", errors="ignore"))))
    return offsets


@pytest.mark.parametrize("pat_name", PAT_NAMES)
@settings(max_examples=MAX_EXAMPLES // 2, deadline=None)
@given(text=st.text(max_size=60))
def test_decode_with_offsets(pat_name, text):
    enc = make_encoding(pat_name)
    oracle = make_oracle(pat_name)
    tokens = enc.encode(text, disallowed_special=())
    try:
        ours_text, ours_offsets = enc.decode_with_offsets(tokens)
    except UnicodeDecodeError:
        return
    theirs_text, theirs_offsets = oracle.decode_with_offsets(tokens)
    assert (ours_text, ours_offsets) == (theirs_text, list(theirs_offsets))
    if tokens:
        assert ours_offsets == _token_offsets_reference(enc, tokens)


def test_decode_with_offsets_multibyte_cases():
    enc = make_encoding("o200k")
    oracle = make_oracle("o200k")
    for text in ["你好世界", "தமிழ் மொழி", " 除外", "naïve café", "🌍🌍"]:
        tokens = enc.encode_ordinary(text)
        assert enc.decode_with_offsets(tokens) == tuple(oracle.decode_with_offsets(tokens))


# ---------------------------------------------------------------------------
# Decode behaviour
# ---------------------------------------------------------------------------


def test_decode_errors_and_key_errors():
    enc = make_encoding("cl100k")
    # default decode is lossy replace
    bad = [enc.encode_single_token(b"\xc3")] if b"\xc3" in enc._mergeable_ranks else None
    if bad:
        assert "�" in enc.decode(bad)
    with pytest.raises(KeyError):
        enc.decode_bytes([10**9])
    with pytest.raises(KeyError):
        enc.decode_single_token_bytes(10**9)
    with pytest.raises(KeyError):
        enc.encode_single_token(b"definitely-not-a-token-xyzzy")


def test_decode_many_specials_iterative():
    # decode with thousands of interleaved specials must not recurse
    # (reference decodes special-dense streams fine; regression for the
    # advisor's RecursionError finding)
    enc = make_encoding("cl100k")
    eot = "<|endoftext|>"
    text = f"hello {eot} " * 3000
    tokens = enc.encode(text, allowed_special="all")
    assert enc.decode(tokens) == text
    # unknown id inside a special-bearing stream still raises KeyError
    with pytest.raises(KeyError):
        enc.decode_bytes(tokens[:50] + [10**9] + tokens[50:])


def test_decode_batch():
    enc = make_encoding("cl100k")
    batches = [enc.encode_ordinary(t) for t in ["hello world", "it's 123", ""]]
    assert enc.decode_batch(batches) == [enc.decode(b) for b in batches]
    assert enc.decode_bytes_batch(batches) == [enc.decode_bytes(b) for b in batches]


def test_encode_to_numpy():
    import numpy as np

    enc = make_encoding("cl100k")
    arr = enc.encode_to_numpy("hello world, it's 123")
    assert arr.dtype == np.uint32
    assert arr.tolist() == enc.encode_ordinary("hello world, it's 123")
    if enc._core_bpe._native_core():
        # zero-copy contract: a view over the C core's buffer, no
        # intermediate Python list (reference: src/py.rs:186-248)
        assert arr.base is not None and arr.base.dtype == np.uint32
    # specials still work (list path)
    eot = "<|endoftext|>"
    arr2 = enc.encode_to_numpy(f"hi {eot}", allowed_special="all")
    assert arr2[-1] == enc.encode_single_token(eot)
    with pytest.raises(ValueError):
        enc.encode_to_numpy(f"hi {eot}")
    # surrogate fallback matches encode()
    assert enc.encode_to_numpy("a\ud800b").tolist() == enc.encode("a\ud800b")
    assert arr.tolist() == enc.encode("hello world, it's 123")


# ---------------------------------------------------------------------------
# Constructor invariants
# ---------------------------------------------------------------------------


def test_duplicate_ranks_rejected():
    with pytest.raises(ValueError):
        tiktoken_tpu.Encoding(
            "dup",
            pat_str=r"\s|\S",
            mergeable_ranks={b"a": 0, b"b": 0},
            special_tokens={},
        )


def test_explicit_n_vocab_checked():
    ranks = {bytes([i]): i for i in range(256)}
    with pytest.raises(AssertionError):
        tiktoken_tpu.Encoding(
            "bad_n",
            pat_str=r"\s|\S",
            mergeable_ranks=ranks,
            special_tokens={},
            explicit_n_vocab=300,
        )
    enc = tiktoken_tpu.Encoding(
        "good_n",
        pat_str=r"\s|\S",
        mergeable_ranks=ranks,
        special_tokens={"<|endoftext|>": 256},
        explicit_n_vocab=257,
    )
    assert enc.n_vocab == 257
    assert enc.eot_token == 256
    assert enc.is_special_token(256)
    assert not enc.is_special_token(0)
    assert repr(enc) == "<Encoding 'good_n'>"


# ---------------------------------------------------------------------------
# Pickle
# ---------------------------------------------------------------------------


def test_pickle_custom_encoding():
    enc = make_encoding("cl100k")
    enc2 = pickle.loads(pickle.dumps(enc))
    assert enc2.encode_ordinary("hello world") == enc.encode_ordinary("hello world")
    assert enc2.name == enc.name


def test_pickle_registered_encoding_by_name(monkeypatch):
    import tiktoken_tpu.registry as registry

    enc = make_encoding("cl100k")
    monkeypatch.setitem(registry.ENCODINGS, enc.name, enc)
    payload = pickle.dumps(enc)
    # Registered encodings pickle by name reference: the payload must not
    # embed the whole rank table.
    assert len(payload) < 1000
    enc2 = pickle.loads(payload)
    assert enc2 is enc or enc2.__dict__ is enc.__dict__


# ---------------------------------------------------------------------------
# Model mapping and registry
# ---------------------------------------------------------------------------


def test_encoding_name_for_model():
    from tiktoken_tpu import encoding_name_for_model

    assert encoding_name_for_model("gpt2") == "gpt2"
    assert encoding_name_for_model("gpt-4o") == "o200k_base"
    assert encoding_name_for_model("gpt-4o-2024-05-13") == "o200k_base"
    assert encoding_name_for_model("gpt-4-0314") == "cl100k_base"
    assert encoding_name_for_model("gpt-3.5-turbo-0301") == "cl100k_base"
    assert encoding_name_for_model("davinci") == "r50k_base"
    assert encoding_name_for_model("text-davinci-003") == "p50k_base"
    assert encoding_name_for_model("code-davinci-edit-001") == "p50k_edit"
    assert encoding_name_for_model("gpt-oss-120b") == "o200k_harmony"
    assert encoding_name_for_model("o1-mini") == "o200k_base"
    with pytest.raises(KeyError):
        encoding_name_for_model("definitely-not-a-model")


def test_registry_lists_shipped_encodings():
    names = tiktoken_tpu.list_encoding_names()
    for expected in (
        "gpt2",
        "r50k_base",
        "p50k_base",
        "p50k_edit",
        "cl100k_base",
        "o200k_base",
        "o200k_harmony",
    ):
        assert expected in names


def test_get_encoding_type_error():
    with pytest.raises(ValueError):
        tiktoken_tpu.get_encoding(123)  # type: ignore[arg-type]


def test_harmony_specials_shape():
    # The o200k_harmony constructor's special-token table has the quirky
    # duplicate id 200018 and the full reserved range; check the table
    # without needing the (network-gated) vocab.
    from tiktoken_tpu_ext.openai_public import _HARMONY_NAMED

    assert _HARMONY_NAMED[200012] == "<|call|>"
    assert 200018 not in _HARMONY_NAMED  # endofprompt comes from the base table


def test_unknown_corpus_strategy_rejected():
    # A typo like "hyrbid" must raise, not silently run the hybrid path
    # (which would compile device programs the caller never asked for).
    enc = make_encoding("cl100k")
    with pytest.raises(ValueError, match="unknown corpus strategy"):
        enc.encode_corpus(["hello"], strategy="hyrbid")
    with pytest.raises(ValueError, match="unknown corpus strategy"):
        enc.resolve_corpus_strategy("fastest")


def test_encode_corpus_all_empty_docs_numpy():
    # The all-empty-docs early return must honor array output: uint32
    # per-doc arrays, and encode_corpus_to_numpy concatenates to uint32.
    import numpy as np

    enc = make_encoding("cl100k")
    per_doc = enc.device_engine.encode_corpus3(["", "", ""], as_numpy=True)
    assert all(isinstance(a, np.ndarray) and a.dtype == np.uint32 and a.size == 0
               for a in per_doc)
    tokens, offsets = enc.encode_corpus_to_numpy(["", ""], strategy="device")
    assert tokens.dtype == np.uint32 and tokens.size == 0
    assert list(offsets) == [0, 0, 0]


def test_encode_corpus_to_numpy_host_fast_path():
    # The resolved-host numpy corpus encode returns the native batch
    # arrays directly (no per-doc view split / re-concat); output must be
    # identical to the general per-doc path and to encode_ordinary, for
    # str and bytes inputs, including empty docs.
    import numpy as np

    enc = make_encoding("cl100k")
    docs = ["hello world", "", "a\n b 12345", "naïve 東京 🌍", "x" * 2000]
    tokens, offsets = enc.encode_corpus_to_numpy(docs, strategy="host")
    assert tokens.dtype == np.uint32 and offsets.dtype == np.int64
    for d, s in enumerate(docs):
        assert list(tokens[offsets[d]:offsets[d + 1]]) == enc.encode_ordinary(s)
    tb, ob = enc.encode_corpus_to_numpy([s.encode() for s in docs],
                                        strategy="host")
    assert np.array_equal(tokens, tb) and np.array_equal(offsets, ob)
    t0, o0 = enc.encode_corpus_to_numpy([], strategy="host")
    assert t0.size == 0 and list(o0) == [0]


def test_device_compile_failure_degrades_one_tier():
    # A compile-capacity failure (e.g. the C=32768 AOT helper SIGKILLed
    # on a constrained host) must retry the pure corpus encode one chunk
    # tier smaller with a warning, not surface an INTERNAL error.
    import warnings

    import jax

    enc = make_encoding("cl100k")
    eng = enc.device_engine
    calls = []
    real = eng.encode_corpus3

    def flaky(texts, **kw):
        calls.append(kw.get("chunk_rows"))
        if kw.get("chunk_rows") is None:  # production tier: "compile" dies
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: remote_compile: HTTP 500: tpu_compile_helper "
                "subprocess exit signal SIGKILL (9)"
            )
        return real(texts, **kw)

    eng.encode_corpus3 = flaky
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            got = enc.encode_corpus(["hello world", "abc 123"],
                                    strategy="device")
        assert calls == [None, 8192], calls
        assert any("retrying at chunk_rows=8192" in str(x.message) for x in w)
        assert got == [enc.encode_ordinary("hello world"),
                       enc.encode_ordinary("abc 123")]
    finally:
        eng.encode_corpus3 = real


def test_device_non_compile_errors_propagate():
    import jax
    import pytest as _pytest

    enc = make_encoding("cl100k")
    eng = enc.device_engine
    real = eng.encode_corpus3

    def broken(texts, **kw):
        raise jax.errors.JaxRuntimeError("INTERNAL: device halted")

    eng.encode_corpus3 = broken
    try:
        with _pytest.raises(jax.errors.JaxRuntimeError, match="device halted"):
            enc.encode_corpus(["hello"], strategy="device")
    finally:
        eng.encode_corpus3 = real
