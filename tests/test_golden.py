"""Golden-value conformance against the reference's public pinned token
ids (reference: tests/test_encoding.py:14-78, tests/test_simple_public.py:7-23).

These require the real vocabulary files. The build environment has no
network egress, so each test auto-skips unless the vocab is already in
the cache (TIKTOKEN_CACHE_DIR or the default data-gym cache); on any
machine with the files (or network), they run for real — including the
device pipeline, which must reproduce every value byte-exactly.
"""

from __future__ import annotations

import pytest


def _get(name):
    import tiktoken_tpu

    try:
        return tiktoken_tpu.get_encoding(name)
    except Exception:
        pytest.skip(f"vocab for {name} not cached and not downloadable (offline)")


def test_simple_gpt2():
    enc = _get("gpt2")
    assert enc.encode("hello world") == [31373, 995]
    assert enc.decode([31373, 995]) == "hello world"
    assert enc.encode("hello <|endoftext|>", allowed_special="all") == [
        31373, 220, 50256,
    ]


def test_simple_cl100k():
    enc = _get("cl100k_base")
    assert enc.encode("hello world") == [15339, 1917]
    assert enc.decode([15339, 1917]) == "hello world"
    assert enc.encode("hello <|endoftext|>", allowed_special="all") == [
        15339, 220, 100257,
    ]


def test_simple_repeated_gpt2():
    enc = _get("gpt2")
    ladder = {
        "0": [15], "00": [405], "000": [830], "0000": [2388],
        "00000": [20483], "000000": [10535], "0000000": [24598],
        "00000000": [8269], "000000000": [10535, 830],
        "0000000000": [8269, 405], "00000000000": [8269, 830],
        "000000000000": [8269, 2388], "0000000000000": [8269, 20483],
        "00000000000000": [8269, 10535], "000000000000000": [8269, 24598],
        "0000000000000000": [25645], "00000000000000000": [8269, 10535, 830],
    }
    for text, want in ladder.items():
        assert enc.encode(text) == want, text


def test_simple_regex_cl100k():
    enc = _get("cl100k_base")
    assert enc.encode("rer") == [38149]
    assert enc.encode("'rer") == [2351, 81]
    assert enc.encode("today\n ") == [31213, 198, 220]
    assert enc.encode("today\n \n") == [31213, 27907]
    assert enc.encode("today\n  \n") == [31213, 14211]


def test_basic_encode_all():
    assert _get("r50k_base").encode("hello world") == [31373, 995]
    assert _get("p50k_base").encode("hello world") == [31373, 995]
    enc = _get("cl100k_base")
    assert enc.encode("hello world") == [15339, 1917]
    assert enc.encode(" \x850") == [220, 126, 227, 15]


def test_single_token_roundtrip_prefix():
    import tiktoken_tpu

    for name in tiktoken_tpu.list_encoding_names():
        enc = _get(name)
        for token in range(min(10_000, enc.max_token_value - 1)):
            assert enc.encode_single_token(
                enc.decode_single_token_bytes(token)
            ) == token


def test_device_pipeline_golden_cl100k():
    """The TPU path must reproduce the public golden values too."""
    enc = _get("cl100k_base")
    texts = ["hello world", "rer", "'rer", "today\n ", "today\n \n",
             "today\n  \n", " \x850"]
    got = enc.encode_corpus(texts, strategy="device")
    assert got == [enc.encode_ordinary(t) for t in texts]
    assert got[0] == [15339, 1917]


def test_large_repeated_o200k():
    enc = _get("o200k_base")
    assert enc.encode("x" * 1_000_000)
