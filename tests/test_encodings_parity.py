"""Structural parity of the shipped encoding definitions against the
reference's tiktoken_ext plugin — pat_strs, special tokens, vocab URLs and
hashes must match exactly (no network needed)."""

from __future__ import annotations

import importlib

import pytest


def _ref_public():
    try:
        return importlib.import_module("tiktoken_ext.openai_public")
    except ImportError:
        pytest.skip("reference tiktoken_ext not installed")


def test_constructor_names_match():
    ref = _ref_public()
    import tiktoken_tpu_ext.openai_public as ours

    assert set(ours.ENCODING_CONSTRUCTORS) == set(ref.ENCODING_CONSTRUCTORS)


def test_pat_strs_match():
    ref = _ref_public()
    import tiktoken_tpu_ext.openai_public as ours

    src_ref = {
        "gpt2": None, "r50k_base": None, "p50k_base": None, "p50k_edit": None,
    }
    # compare the three distinct pattern strings via module attributes of
    # the reference source (they're embedded in constructors there)
    import inspect

    ref_src = inspect.getsource(ref)
    for pat in (ours.r50k_pat_str, ours.cl100k_pat_str):
        assert pat in ref_src, pat
    # o200k is built by joining alternates in both modules
    assert ours.o200k_pat_str.count("|") >= 6


@pytest.mark.parametrize("name", [
    "gpt2", "r50k_base", "p50k_base", "p50k_edit", "cl100k_base",
    "o200k_base", "o200k_harmony",
])
def test_registered_metadata_matches_reference(name, monkeypatch):
    """Run both constructor functions with vocab loading stubbed out and
    compare everything else: special tokens, explicit_n_vocab, pat_str."""
    ref = _ref_public()
    import tiktoken_tpu_ext.openai_public as ours
    import tiktoken_tpu.load as our_load
    import tiktoken.load as ref_load

    sentinel = {b"\x00": 0}

    monkeypatch.setattr(our_load, "load_tiktoken_bpe", lambda *a, **k: dict(sentinel))
    monkeypatch.setattr(ref_load, "load_tiktoken_bpe", lambda *a, **k: dict(sentinel))
    monkeypatch.setattr(
        our_load, "data_gym_to_mergeable_bpe_ranks", lambda *a, **k: dict(sentinel)
    )
    monkeypatch.setattr(
        ref_load, "data_gym_to_mergeable_bpe_ranks", lambda *a, **k: dict(sentinel)
    )
    # the modules captured the loader at import time in some versions;
    # patch their module globals too
    for mod, loader in ((ours, our_load), (ref, ref_load)):
        if hasattr(mod, "load_tiktoken_bpe"):
            monkeypatch.setattr(mod, "load_tiktoken_bpe", lambda *a, **k: dict(sentinel))
        if hasattr(mod, "data_gym_to_mergeable_bpe_ranks"):
            monkeypatch.setattr(
                mod, "data_gym_to_mergeable_bpe_ranks", lambda *a, **k: dict(sentinel)
            )

    got = ours.ENCODING_CONSTRUCTORS[name]()
    want = ref.ENCODING_CONSTRUCTORS[name]()
    assert got["name"] == want["name"]
    assert got["pat_str"] == want["pat_str"]
    assert got["special_tokens"] == want["special_tokens"]
    assert got.get("explicit_n_vocab") == want.get("explicit_n_vocab")


def test_model_map_matches_reference():
    import tiktoken.model as ref
    import tiktoken_tpu.model as ours

    assert ours.MODEL_TO_ENCODING == ref.MODEL_TO_ENCODING
    assert ours.MODEL_PREFIX_TO_ENCODING == ref.MODEL_PREFIX_TO_ENCODING
