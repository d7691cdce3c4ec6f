"""Scanner-DFA compiler: differential split-position parity.

The DFA must reproduce the backtracking engine's splits exactly:
leftmost-first alternation, greedy quantifiers, the (?!\\S) lookahead and
the \\s++$ anchor, over all three shipped patterns. Ground truth here is
the Python regex module on the rust-compat rewritten pattern, which the
host-parity suite already ties byte-exactly to the reference Rust engine.
"""

from __future__ import annotations

import pytest
import regex as re
from hypothesis import given, settings
from hypothesis import strategies as st

from tiktoken_tpu._pybpe import rust_compat_pattern
from tiktoken_tpu.ops.regex_compiler import compile_pattern_cached, split_pieces

from .helpers import MAX_EXAMPLES, PAT_NAMES, make_mixed_corpus, pat_str


def _strip_skew(text: str) -> str:
    """Remove codepoints whose category differs between local unicodedata
    and the Python regex module: the regex module cannot arbitrate splits
    on those (the reference engine itself is the arbiter there, covered by
    test_dfa_end_to_end_vs_reference)."""
    import bisect

    from tiktoken_tpu.ops._unicode_overrides import SKEW

    los = [lo for lo, _ in SKEW]

    def in_skew(ch: str) -> bool:
        i = bisect.bisect_right(los, ord(ch)) - 1
        return i >= 0 and SKEW[i][0] <= ord(ch) <= SKEW[i][1]

    return "".join(ch for ch in text if not in_skew(ch))


def _regex_pieces(pat_name: str, text: str) -> list[bytes]:
    rx = re.compile(rust_compat_pattern(pat_str(pat_name)))
    return [m.group().encode() for m in rx.finditer(text)]


def _dfa_pieces(pat_name: str, text: str) -> list[bytes]:
    dfa = compile_pattern_cached(pat_str(pat_name))
    return split_pieces(dfa, text.encode())


_texts = st.one_of(
    st.text(max_size=60),
    st.text(alphabet=st.sampled_from(" \t\n\r'sdmltvre0123456789!.é漢ſḰ"), max_size=60),
    st.sampled_from(
        [
            "today\n \n", "x'S", "'ſ", "ab'll've", "123456", " 1234",
            "@#\r\n\r\n", "a/b/c\n", "ΔΣ δσ", "Ｘｙｚ", "👍🏽", "é́̂",
            " 　 x", " ", "word  \n  word",
        ]
    ),
)


@pytest.mark.parametrize("pat_name", PAT_NAMES)
@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(text=_texts)
def test_dfa_splits_match_regex(pat_name, text):
    text = _strip_skew(text)
    assert _dfa_pieces(pat_name, text) == _regex_pieces(pat_name, text)


@pytest.mark.parametrize("pat_name", PAT_NAMES)
@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(text=st.text(max_size=40))
def test_dfa_end_to_end_vs_reference(pat_name, text):
    """The real ground truth: host BPE over DFA pieces must reproduce the
    reference engine's token ids exactly — including on codepoints where
    local Unicode data sources disagree."""
    from tiktoken_tpu._pybpe import byte_pair_encode

    from .helpers import make_oracle, trained_ranks

    try:
        data = text.encode("utf-8")
    except UnicodeEncodeError:
        return  # surrogates: handled upstream of the scanner
    ranks = trained_ranks(pat_name)
    oracle = make_oracle(pat_name)
    toks: list[int] = []
    for piece in _dfa_pieces(pat_name, text):
        rank = ranks.get(piece)
        toks.extend([rank] if rank is not None else byte_pair_encode(piece, ranks))
    assert toks == oracle.encode_ordinary(text)


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_dfa_splits_on_corpus(pat_name):
    corpus = make_mixed_corpus(30_000, seed=5)
    assert _dfa_pieces(pat_name, corpus) == _regex_pieces(pat_name, corpus)


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_dfa_splits_adversarial(pat_name):
    for text in ["x" * 2000, "0" * 2000, " " * 1000, "\n" * 1000,
                 " \n" * 500, ("^ 0 a 's " + "\n") * 100]:
        assert _dfa_pieces(pat_name, text) == _regex_pieces(pat_name, text)


def test_pieces_concatenate_to_input():
    corpus = make_mixed_corpus(10_000, seed=6)
    for pat_name in PAT_NAMES:
        pieces = _dfa_pieces(pat_name, corpus)
        assert b"".join(pieces) == corpus.encode()


def test_artifact_cache_roundtrip(tmp_path, monkeypatch):
    import numpy as np

    monkeypatch.setenv("TIKTOKEN_TPU_CACHE_DIR", str(tmp_path))
    from tiktoken_tpu.ops.artifacts import cached_scanner_dfa

    d1 = cached_scanner_dfa(pat_str("r50k"))
    d2 = cached_scanner_dfa(pat_str("r50k"))  # second load hits the cache
    assert np.array_equal(d1.trans, d2.trans)
    assert np.array_equal(d1.accept, d2.accept)
    assert split_pieces(d2, "hello world it's 42".encode()) == [
        b"hello", b" world", b" it", b"'s", b" 42"
    ]


# ---------------------------------------------------------------------------
# Extended dialect: \d \D \w \W and the `.` wildcard (custom pat_str support;
# reference accepts any fancy_regex pattern, src/lib.rs:623)
# ---------------------------------------------------------------------------

_DIALECT_PATS = [
    r"\d+|\w+|\s+|.",
    r"'(?i:[sdmt]|ll|ve|re)|\w+|\d{1,3}|[^\s\w]+|\s+",
    r"\W+|\w+",
    r"\D+|\d+",
]


@pytest.mark.parametrize("pat", _DIALECT_PATS)
@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(text=_texts)
def test_dialect_vs_reference(pat, text):
    """\\d/\\w/\\D/\\W/. compile to the reference engine's exact sets
    (word_set is probed from the installed reference; \\d is \\p{Nd}).

    Byte coverage: with a byte-rank vocab every reference token is one
    byte, so decoding the reference's ids must reproduce the input and
    our piece concatenation must match. Boundary positions: checked via
    merge-sensitive end-to-end parity in test_dialect_encode_parity."""
    import tiktoken

    ranks = {bytes([i]): i for i in range(256)}
    ref = tiktoken.Encoding("ref", pat_str=pat, mergeable_ranks=ranks,
                            special_tokens={})
    dfa = compile_pattern_cached(pat)
    got = split_pieces(dfa, text.encode())
    assert b"".join(got) == bytes(ref.encode_ordinary(text)) == text.encode()


@pytest.mark.parametrize("pat", _DIALECT_PATS)
def test_dialect_encode_parity(pat):
    """End-to-end token-id parity on a trained vocab: merges depend on
    piece boundaries, so agreement here pins the split positions too."""
    import tiktoken

    import tiktoken_tpu

    from .helpers import trained_ranks

    ranks = trained_ranks("o200k", 512)
    ref = tiktoken.Encoding("ref", pat_str=pat, mergeable_ranks=ranks,
                            special_tokens={})
    ours = tiktoken_tpu.Encoding("ours", pat_str=pat, mergeable_ranks=ranks,
                                 special_tokens={})
    for seed in range(4):
        s = make_mixed_corpus(1500, seed=seed)
        assert ours.encode_ordinary(s) == ref.encode_ordinary(s)
    for s in ["", ".", "a.b", "ab_cd", "x\u0301y", "a\nb.c", "123٤٥٦ ÅΩ",
              "\u200d\u200c", "don't 'll"]:
        assert ours.encode_ordinary(s) == ref.encode_ordinary(s), repr(s)
