"""Shared test fixtures: synthetic corpora, trained vocabularies, and the
reference library as a differential oracle.

The environment has no network egress, so the real vocab files
(cl100k_base.tiktoken etc.) cannot be downloaded. Instead we train small
BPE vocabularies locally on a mixed-Unicode corpus with the *real* split
patterns, then construct both our Encoding and a reference
``tiktoken.Encoding`` with identical parameters. The reference's Rust core
is the ground truth for byte-exact token-id parity. This mirrors the
reference's own differential-oracle test pattern
(reference: tests/test_offsets.py:19-25).
"""

from __future__ import annotations

import functools
import os
import random

MAX_EXAMPLES: int = int(os.environ.get("TIKTOKEN_TPU_MAX_EXAMPLES", "100"))
# Opt-in slow tier: extra geometries + heavyweight XLA:CPU compiles
# (each distinct (C, K, variant) program costs minutes on a 1-core box)
FULL_TESTS: bool = os.environ.get("TIKTOKEN_TPU_FULL_TESTS") == "1"

SPECIAL_TOKENS_TEMPLATE = ("<|endoftext|>", "<|im_start|>", "<|im_end|>", "<|fim_prefix|>")

_WORDS_EN = (
    "the quick brown fox jumps over lazy dog hello world it's we've don't I'll "
    "they're you'd state-of-the-art tokenizer throughput benchmark pallas kernel "
    "mesh shard collective compile trace fuse scan merge rank byte pair encode"
).split()
_WORDS_UNI = (
    "naïve café jalapeño Zürich Москва привет мир 東京 こんにちは 世界 你好 北京 "
    "مرحبا بالعالم שלום עולם Ελληνικά γειά σου κόσμος हिन्दी नमस्ते 한국어 안녕하세요"
).split()
_EMOJI = ["🌍", "🚀", "🤖", "✨", "🎉", "🧪", "🌈", "☀️", "👩‍🔬", "🏳️‍🌈"]
_PUNCT = [".", ",", "!", "?", ";", ":", "—", "(", ")", "[", "]", "{", "}", "\"", "'", "...", "->", "</", "/>", "#", "@@"]
_WS = [" ", "  ", "   ", "\n", "\n\n", "\r\n", "\t", " \n", "\n ", " ", "　"]


def make_mixed_corpus(n_chars: int, seed: int = 0) -> str:
    """Deterministic mixed-Unicode corpus: words from several scripts,
    digits, contractions, punctuation runs, and varied whitespace."""
    rng = random.Random(seed)
    out: list[str] = []
    size = 0
    while size < n_chars:
        r = rng.random()
        if r < 0.55:
            tok = rng.choice(_WORDS_EN)
            if rng.random() < 0.3:
                tok = tok.capitalize()
        elif r < 0.70:
            tok = rng.choice(_WORDS_UNI)
        elif r < 0.78:
            tok = str(rng.randrange(10 ** rng.randrange(1, 8)))
        elif r < 0.86:
            tok = rng.choice(_PUNCT) * rng.randrange(1, 4)
        elif r < 0.90:
            tok = rng.choice(_EMOJI)
        else:
            tok = rng.choice(_WS)
            out.append(tok)
            size += len(tok)
            continue
        sep = rng.choice(_WS) if rng.random() < 0.25 else " "
        out.append(tok)
        out.append(sep)
        size += len(tok) + len(sep)
    return "".join(out)


@functools.lru_cache(maxsize=None)
def trained_ranks(pat_name: str, vocab_size: int = 2000) -> dict[bytes, int]:
    from tiktoken_tpu.train import train_bpe

    return train_bpe([make_mixed_corpus(300_000, seed=42)], vocab_size, pat_str(pat_name))


def pat_str(pat_name: str) -> str:
    import tiktoken_tpu_ext.openai_public as pub

    return {
        "r50k": pub.r50k_pat_str,
        "cl100k": pub.cl100k_pat_str,
        "o200k": pub.o200k_pat_str,
    }[pat_name]


def special_tokens_for(ranks: dict[bytes, int]) -> dict[str, int]:
    base = len(ranks)
    return {name: base + i for i, name in enumerate(SPECIAL_TOKENS_TEMPLATE)}


@functools.lru_cache(maxsize=None)
def make_encoding(pat_name: str, vocab_size: int = 2000):
    """Our Encoding over a locally-trained vocab with the real pat_str."""
    import tiktoken_tpu

    ranks = trained_ranks(pat_name, vocab_size)
    return tiktoken_tpu.Encoding(
        f"test_{pat_name}_{vocab_size}",
        pat_str=pat_str(pat_name),
        mergeable_ranks=ranks,
        special_tokens=special_tokens_for(ranks),
    )


@functools.lru_cache(maxsize=None)
def make_oracle(pat_name: str, vocab_size: int = 2000):
    """The reference library's Encoding with identical parameters: the
    byte-exact ground truth (its Rust core is what we must match)."""
    import tiktoken

    ranks = trained_ranks(pat_name, vocab_size)
    return tiktoken.Encoding(
        f"oracle_{pat_name}_{vocab_size}",
        pat_str=pat_str(pat_name),
        mergeable_ranks=ranks,
        special_tokens=special_tokens_for(ranks),
    )


PAT_NAMES = ("r50k", "cl100k", "o200k")
# Device-pipeline corpus tests parameterized per pattern compile a
# distinct program set per pat_str (each is its own DFA) — minutes each
# on the 1-core XLA:CPU box. The fast tier keeps o200k, the hardest
# pattern (case groups, \p{M} runs, 7-alternative join; SURVEY §7);
# r50k/cl100k DEVICE programs run in the full tier (CI sets
# TIKTOKEN_TPU_FULL_TESTS=1). Their DFAs stay covered in the fast tier
# by the compiler/scan/host-parity modules, which keep full PAT_NAMES.
DEVICE_PAT_NAMES = PAT_NAMES if FULL_TESTS else ("o200k",)
