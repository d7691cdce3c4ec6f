"""Parallel merge rule: order-equivalence with sequential greedy BPE.

The device merges all conservative local minima per round
(ops/merge.py); these tests fuzz that rule against the sequential oracle
(_pybpe.byte_pair_encode) on adversarial vocabularies — including
engineered periodic ones where naive chain-alternation schemes break —
plus the pair-table lookup itself.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from tiktoken_tpu._pybpe import byte_pair_encode
from tiktoken_tpu.ops.merge import encode_block_tokens_numpy, merge_block_numpy
from tiktoken_tpu.ops.pair_table import build_pair_table, lookup_numpy

from .helpers import make_mixed_corpus, pat_str, trained_ranks


def _random_bpe_vocab(rng: random.Random, n_merges: int, alphabet: bytes) -> dict[bytes, int]:
    """Random vocab satisfying the BPE invariants: every merge concatenates
    two existing tokens; rank order == creation order."""
    ranks = {bytes([i]): i for i in range(256)}
    tokens = [bytes([b]) for b in alphabet]
    for _ in range(n_merges):
        for _attempt in range(50):
            a = rng.choice(tokens)
            b = rng.choice(tokens)
            cat = a + b
            if len(cat) <= 12 and cat not in ranks:
                ranks[cat] = len(ranks)
                tokens.append(cat)
                break
    return ranks


def _periodic_bpe_vocab() -> dict[bytes, int]:
    """Engineered periodic vocab: powers of 'x' and 'ab' with rank orders
    chosen to defeat unsound chain-alternation (longer power trained
    before a shorter one)."""
    ranks = {bytes([i]): i for i in range(256)}
    n = 256
    for tok in [b"xx", b"xxxx", b"xxx", b"ab", b"abab", b"ababab", b"abababab",
                b"xxxxxx", b"xxxxx", b"ba", b"baba", b"aba", b"bab"]:
        ranks[tok] = n
        n += 1
    return ranks


def _device_rule_tokens(ranks: dict[bytes, int], piece: bytes) -> list[int]:
    table = build_pair_table(ranks)
    byte_vals = np.frombuffer(piece, dtype=np.uint8)
    piece_start = np.zeros(len(piece), dtype=bool)
    piece_start[0] = True
    valid = np.ones(len(piece), dtype=bool)
    return encode_block_tokens_numpy(table, byte_vals, piece_start, valid)


def test_periodic_vocab_parity():
    ranks = _periodic_bpe_vocab()
    for piece in [b"x" * n for n in range(2, 40)] + [
        b"ab" * n for n in range(1, 20)
    ] + [b"aab" * 7, b"xxxaxxx", b"abxxab", b"bababab", b"abba" * 5]:
        want = byte_pair_encode(piece, ranks)
        got = _device_rule_tokens(ranks, piece)
        assert got == want, piece


def test_random_vocab_fuzz():
    rng = random.Random(1234)
    for trial in range(40):
        alphabet = bytes(rng.sample(range(97, 105), rng.randrange(2, 5)))
        ranks = _random_bpe_vocab(rng, rng.randrange(5, 120), alphabet)
        for _ in range(25):
            n = rng.randrange(2, 60)
            piece = bytes(rng.choice(alphabet) for _ in range(n))
            want = byte_pair_encode(piece, ranks)
            got = _device_rule_tokens(ranks, piece)
            assert got == want, (trial, piece)


def test_multi_piece_block():
    """Several pieces in one block merge independently."""
    ranks = trained_ranks("cl100k")
    table = build_pair_table(ranks)
    pieces = [b"hello", b" world", b" it", b"'s", b" 12345", b"!!!"]
    data = b"".join(pieces)
    byte_vals = np.frombuffer(data, dtype=np.uint8)
    piece_start = np.zeros(len(data), dtype=bool)
    off = 0
    for p in pieces:
        piece_start[off] = True
        off += len(p)
    valid = np.ones(len(data), dtype=bool)
    got = encode_block_tokens_numpy(table, byte_vals, piece_start, valid)
    want = []
    for p in pieces:
        r = ranks.get(p)
        want.extend([r] if r is not None else byte_pair_encode(p, ranks))
    assert got == want


def test_padding_and_invalid_regions():
    ranks = trained_ranks("cl100k")
    table = build_pair_table(ranks)
    data = b"hello\x00\x00 world"
    byte_vals = np.frombuffer(data, dtype=np.uint8)
    valid = np.ones(len(data), dtype=bool)
    valid[5:7] = False  # separator region
    piece_start = np.zeros(len(data), dtype=bool)
    piece_start[0] = True
    piece_start[7] = True
    got = encode_block_tokens_numpy(table, byte_vals, piece_start, valid)
    want = []
    for p in (b"hello", b" world"):
        r = ranks.get(p)
        want.extend([r] if r is not None else byte_pair_encode(p, ranks))
    assert got == want


def test_pair_table_lookup():
    ranks = trained_ranks("o200k")
    table = build_pair_table(ranks)
    rng = random.Random(7)
    ids = list(ranks.values())
    by_id = {v: k for k, v in ranks.items()}
    a = np.asarray([rng.choice(ids) for _ in range(2000)], dtype=np.uint32)
    b = np.asarray([rng.choice(ids) for _ in range(2000)], dtype=np.uint32)
    got = lookup_numpy(table, a, b)
    for i in range(len(a)):
        cat = by_id[int(a[i])] + by_id[int(b[i])]
        want = ranks.get(cat, 0xFFFFFFFF)
        assert int(got[i]) == want

    # every enumerated pair must hit
    from tiktoken_tpu.ops.pair_table import enumerate_pairs

    ka, kb, kv = enumerate_pairs(ranks)
    got = lookup_numpy(table, ka, kb)
    assert np.array_equal(got, kv)


def test_long_run_converges():
    """'x'*4000: the adversarial case the reference needs its heap for;
    the positional round loop must converge and agree."""
    ranks = trained_ranks("cl100k")
    table = build_pair_table(ranks)
    piece = b"x" * 4000
    want = byte_pair_encode(piece, ranks)
    byte_vals = np.frombuffer(piece, dtype=np.uint8)
    piece_start = np.zeros(len(piece), dtype=bool)
    piece_start[0] = True
    got = encode_block_tokens_numpy(table, byte_vals, piece_start, np.ones(len(piece), bool))
    assert got == want
