"""Differential parity of the host engine against the reference library.

Every test constructs our Encoding and the reference's Encoding from
identical (pat_str, mergeable_ranks, special_tokens) and asserts byte-exact
agreement. Mirrors the reference's own test strategy
(reference: tests/test_encoding.py) with hypothesis property tests layered
on top.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from .helpers import MAX_EXAMPLES, PAT_NAMES, make_encoding, make_oracle

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


# Text strategy biased towards tokenizer edge cases: contractions, digit
# runs, punctuation+newline mixes, whitespace runs, and multi-script text.
_edge = st.sampled_from(
    [
        "'s", "'t", "'re", "'VE", "'Ll", "x'd", "it's we've",
        "123", "1234", "0" * 12, "3.14159", "a1b2c3",
        "hello world", "Hello World", "HELLO", "HelloWorld", "ΔΣδσ",
        " !", "  !", "!!!", "?!...", "#@$", "a\nb", "a\n b", "\n\n0",
        "today\n \n", "today\n  \n", "\n \n", " \r\n\r\n", "\r\n",
        "   leading", "trailing   ", "\t\t", " 　 ", " x",
        "東京タワー", "こんにちは世界", "Ψψ", "мир!", "x🌍y", "👩‍🔬🔬",
        "aب1", "́abc", "é̂f", "ａｂｃ", "½¾", "Ⅷ",
        "", " ", "\n", "'", "’s", "can't won't", "/usr/local/bin", "a/b\r\n",
    ]
)
_texts = st.one_of(
    st.text(max_size=80),
    _edge,
    st.tuples(_edge, _edge, _edge).map("".join),
    st.text(
        alphabet=st.sampled_from(" \t\n\r0123456789abcDEF'éж七.!?-"), max_size=120
    ),
)


@pytest.mark.parametrize("pat_name", PAT_NAMES)
@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(text=_texts)
def test_encode_ordinary_matches_oracle(pat_name, text):
    enc = make_encoding(pat_name)
    oracle = make_oracle(pat_name)
    assert enc.encode_ordinary(text) == oracle.encode_ordinary(text)


@pytest.mark.parametrize("pat_name", PAT_NAMES)
@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(text=_texts)
def test_encode_roundtrip(pat_name, text):
    enc = make_encoding(pat_name)
    tokens = enc.encode(text, disallowed_special=())
    assert enc.decode(tokens) == text or enc.decode_bytes(tokens) == text.encode("utf-8")


@pytest.mark.parametrize("pat_name", PAT_NAMES)
@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(data=st.binary(max_size=64))
def test_encode_bytes_roundtrip_matches_oracle(pat_name, data):
    enc = make_encoding(pat_name)
    oracle = make_oracle(pat_name)
    ours = enc._encode_bytes(data)
    assert enc.decode_bytes(ours) == data
    assert ours == oracle._encode_bytes(data)


@pytest.mark.parametrize("pat_name", PAT_NAMES)
@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(text=_texts)
def test_encode_with_specials_in_text(pat_name, text):
    enc = make_encoding(pat_name)
    oracle = make_oracle(pat_name)
    salted = f"{text}<|endoftext|>{text}<|im_start|>x"
    ours = enc.encode(salted, allowed_special="all")
    theirs = oracle.encode(salted, allowed_special="all")
    assert ours == theirs
    # Disallowed specials encode as plain text when the check is disabled.
    assert enc.encode(salted, disallowed_special=()) == oracle.encode(
        salted, disallowed_special=()
    )


@pytest.mark.parametrize("pat_name", PAT_NAMES)
@settings(max_examples=MAX_EXAMPLES // 2, deadline=None)
@given(text=_texts)
def test_encode_with_unstable_matches_oracle(pat_name, text):
    enc = make_encoding(pat_name)
    oracle = make_oracle(pat_name)
    # Texts containing a disallowed special token must raise in BOTH
    # libraries (same policing as encode; found by the fuzz soak when
    # hypothesis generated a literal "<|fim_prefix|>").
    try:
        theirs_stable, theirs_completions = oracle.encode_with_unstable(text)
    except ValueError:
        with pytest.raises(ValueError):
            enc.encode_with_unstable(text)
        return
    ours_stable, ours_completions = enc.encode_with_unstable(text)
    assert ours_stable == theirs_stable
    assert {tuple(c) for c in ours_completions} == {tuple(c) for c in theirs_completions}


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_unstable_contract(pat_name):
    enc = make_encoding(pat_name)
    for text in ["hello fanta", "hello wor", "  ", "x 12", "done.\n\n", "héll"]:
        stable, completions = enc.encode_with_unstable(text)
        assert text.encode().startswith(enc.decode_bytes(stable))
        for seq in completions:
            assert enc.decode_bytes(stable + list(seq)).startswith(
                text.encode()[: len(enc.decode_bytes(stable + list(seq)))]
            )


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_adversarial_repetition(pat_name):
    enc = make_encoding(pat_name)
    oracle = make_oracle(pat_name)
    for s in ["x" * 10_000, "0" * 5_000, " " * 4_000, "ab" * 3_000, "^" * 1_000,
              ("^ 0 a 's " + "\n") * 500]:
        assert enc.encode_ordinary(s) == oracle.encode_ordinary(s)


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_merge_ladder(pat_name):
    # The "0"*n ladder exercises tie-breaking on runs of identical pairs
    # (reference: tests/test_encoding.py:31-49).
    enc = make_encoding(pat_name)
    oracle = make_oracle(pat_name)
    for n in range(1, 65):
        s = "0" * n
        assert enc.encode_ordinary(s) == oracle.encode_ordinary(s), n


@pytest.mark.parametrize("pat_name", PAT_NAMES)
@settings(max_examples=MAX_EXAMPLES // 2, deadline=None)
@given(text=_texts)
def test_single_piece_and_native_bpe(pat_name, text):
    enc = make_encoding(pat_name)
    oracle = make_oracle(pat_name)
    data = text.encode("utf-8")
    if data:
        assert enc._encode_single_piece(data) == oracle._encode_single_piece(data)
    assert enc._encode_only_native_bpe(text) == enc.encode_ordinary(text)


def test_surrogates_and_lone_surrogates():
    enc = make_encoding("cl100k")
    oracle = make_oracle("cl100k")
    # Paired surrogates decode to the astral character; lone ones to U+FFFD
    # (reference: tests/test_encoding.py:102-110).
    paired = "😂"
    assert enc.encode(paired, disallowed_special=()) == oracle.encode(
        paired, disallowed_special=()
    )
    assert enc.encode(paired, disallowed_special=()) == enc.encode_ordinary("😂")
    lone = "\ud83d"
    assert enc.encode(lone, disallowed_special=()) == enc.encode_ordinary("�")


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_token_byte_values_and_single_token_roundtrip(pat_name):
    enc = make_encoding(pat_name)
    oracle = make_oracle(pat_name)
    assert enc.token_byte_values() == oracle.token_byte_values()
    for token in range(0, enc.n_vocab - len(enc.special_tokens_set), 7):
        token_bytes = enc.decode_single_token_bytes(token)
        assert enc.encode_single_token(token_bytes) == token


@pytest.mark.parametrize("pat_name", PAT_NAMES)
@settings(max_examples=MAX_EXAMPLES // 2, deadline=None)
@given(texts=st.lists(_texts, max_size=6))
def test_batch_matches_sequential(pat_name, texts):
    enc = make_encoding(pat_name)
    assert enc.encode_ordinary_batch(texts, num_threads=2) == [
        enc.encode_ordinary(t) for t in texts
    ]
    assert enc.encode_batch(texts, num_threads=2, disallowed_special=()) == [
        enc.encode(t, disallowed_special=()) for t in texts
    ]


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_unicode_skew_codepoints_parity(pat_name):
    """Codepoints whose category differs between the local regex module and
    the reference engine's Unicode data must still split identically (the
    host path defers them to the scanner DFA). Regression: U+323B0 (CJK
    Ext J, added after the reference's Unicode version) made the piece
    split — and therefore the unstable tail — diverge."""
    enc = make_encoding(pat_name)
    oracle = make_oracle(pat_name)
    for text in ["A\U000323b0", ":\U0003291c", "\U000323b0x 1", "a \U00031350b"]:
        assert enc.encode_ordinary(text) == oracle.encode_ordinary(text), repr(text)
        ours_stable, ours_comp = enc.encode_with_unstable(text)
        theirs_stable, theirs_comp = oracle.encode_with_unstable(text)
        assert ours_stable == theirs_stable, repr(text)
        assert {tuple(c) for c in ours_comp} == {tuple(c) for c in theirs_comp}, repr(text)
