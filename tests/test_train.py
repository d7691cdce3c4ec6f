"""Trainer invariants and loader format tests."""

from __future__ import annotations

import os

import pytest

from tiktoken_tpu.load import dump_tiktoken_bpe, load_tiktoken_bpe
from tiktoken_tpu.train import train_bpe

from .helpers import make_mixed_corpus, pat_str


def test_trainer_invariants():
    ranks = train_bpe([make_mixed_corpus(50_000, seed=7)], 600, pat_str("cl100k"))
    # All 256 single bytes present with ranks 0..255.
    for b in range(256):
        assert ranks[bytes([b])] == b
    # Rank order == merge priority and every multi-byte token splits into
    # two earlier-rank tokens (the invariant the whole framework relies on).
    by_rank = sorted(ranks.items(), key=lambda kv: kv[1])
    assert [r for _, r in by_rank] == list(range(len(ranks)))
    table = set()
    for token, rank in by_rank:
        if len(token) > 1:
            assert any(
                token[:i] in table and token[i:] in table for i in range(1, len(token))
            ), token
        table.add(token)


def test_trained_vocab_usable_by_reference():
    import tiktoken

    ranks = train_bpe([make_mixed_corpus(50_000, seed=7)], 600, pat_str("cl100k"))
    enc = tiktoken.Encoding(
        "t", pat_str=pat_str("cl100k"), mergeable_ranks=ranks, special_tokens={}
    )
    text = make_mixed_corpus(2_000, seed=8)
    assert enc.decode(enc.encode_ordinary(text)) == text


def test_tiktoken_format_roundtrip(tmp_path):
    ranks = train_bpe([make_mixed_corpus(20_000, seed=3)], 400, pat_str("r50k"))
    path = str(tmp_path / "test.tiktoken")
    dump_tiktoken_bpe(ranks, path)
    assert load_tiktoken_bpe(path) == ranks


def test_read_file_cached(tmp_path, monkeypatch):
    import hashlib

    from tiktoken_tpu.load import read_file_cached

    src = tmp_path / "vocab.bin"
    src.write_bytes(b"hello vocab")
    cache_dir = tmp_path / "cache"
    monkeypatch.setenv("TIKTOKEN_TPU_CACHE_DIR", str(cache_dir))

    digest = hashlib.sha256(b"hello vocab").hexdigest()
    assert read_file_cached(str(src), digest) == b"hello vocab"
    # Cached now; remove the source and it still reads from cache.
    os.remove(src)
    assert read_file_cached(str(src), digest) == b"hello vocab"
    # Wrong expected hash evicts and tries to re-fetch, which now fails.
    with pytest.raises(FileNotFoundError):
        read_file_cached(str(src), "0" * 64)


def test_cache_disabled_with_empty_env(tmp_path, monkeypatch):
    from tiktoken_tpu.load import read_file_cached

    src = tmp_path / "vocab.bin"
    src.write_bytes(b"data")
    monkeypatch.setenv("TIKTOKEN_TPU_CACHE_DIR", "")
    assert read_file_cached(str(src)) == b"data"


def test_data_gym_format(tmp_path, monkeypatch):
    # Build a tiny synthetic data_gym pair (vocab.bpe + encoder.json) and
    # check the converter agrees with its own cross-check.
    import base64  # noqa: F401  (kept for symmetry with other loaders)
    import json

    monkeypatch.setenv("TIKTOKEN_TPU_CACHE_DIR", "")

    from tiktoken_tpu.load import _data_gym_byte_remap, data_gym_to_mergeable_bpe_ranks

    remap = _data_gym_byte_remap()
    byte_to_char = {v: k for k, v in remap.items()}

    def enc_str(bs: bytes) -> str:
        return "".join(byte_to_char[b] for b in bs)

    merges = [(b"h", b"e"), (b"l", b"l"), (b"he", b"ll"), (b"hell", b"o")]
    vocab_bpe = "#version: test\n" + "\n".join(
        f"{enc_str(a)} {enc_str(b)}" for a, b in merges
    ) + "\n"
    (tmp_path / "vocab.bpe").write_text(vocab_bpe)

    encoder = {enc_str(bytes([b])): i for i, b in enumerate(remap.values())}
    n = 256
    for a, b in merges:
        encoder[enc_str(a + b)] = n
        n += 1
    (tmp_path / "encoder.json").write_text(json.dumps(encoder))

    ranks = data_gym_to_mergeable_bpe_ranks(
        str(tmp_path / "vocab.bpe"), str(tmp_path / "encoder.json")
    )
    assert ranks[b"hello"] == 259
    assert len(ranks) == 260


def test_educational_module():
    from tiktoken_tpu._educational import SimpleBytePairEncoding

    enc = SimpleBytePairEncoding.train(
        "hello world " * 50 + "hell no ", vocab_size=280, pat_str=pat_str("r50k")
    )
    tokens = enc.encode("hello world", visualise=None)
    assert enc.decode(tokens) == "hello world"
    assert enc.decode_bytes(tokens) == b"hello world"
    assert b"".join(enc.decode_tokens_bytes(tokens)) == b"hello world"


def test_data_gym_matches_reference_converter(tmp_path, monkeypatch):
    """The GPT-2 format converter must agree with the reference's converter
    on the same synthetic vocab.bpe + encoder.json."""
    import json

    monkeypatch.setenv("TIKTOKEN_TPU_CACHE_DIR", "")
    monkeypatch.setenv("TIKTOKEN_CACHE_DIR", "")

    from tiktoken_tpu.load import _data_gym_byte_remap, data_gym_to_mergeable_bpe_ranks
    import tiktoken.load as ref_load

    remap = _data_gym_byte_remap()
    byte_to_char = {v: k for k, v in remap.items()}
    enc_str = lambda bs: "".join(byte_to_char[b] for b in bs)

    merges = [(b"t", b"h"), (b"i", b"n"), (b"th", b"in"), (b"e", b"r"),
              (b"thin", b"g"), (b"in", b"g")]
    vocab_bpe = "#version: x\n" + "\n".join(
        f"{enc_str(a)} {enc_str(b)}" for a, b in merges
    ) + "\n"
    (tmp_path / "vocab.bpe").write_text(vocab_bpe)
    encoder = {enc_str(bytes([b])): i for i, b in enumerate(remap.values())}
    n = 256
    for a, b in merges:
        encoder[enc_str(a + b)] = n
        n += 1
    (tmp_path / "encoder.json").write_text(json.dumps(encoder))

    ours = data_gym_to_mergeable_bpe_ranks(
        str(tmp_path / "vocab.bpe"), str(tmp_path / "encoder.json")
    )
    theirs = ref_load.data_gym_to_mergeable_bpe_ranks(
        str(tmp_path / "vocab.bpe"), str(tmp_path / "encoder.json")
    )
    assert ours == theirs
