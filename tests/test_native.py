"""Native C++ host core: differential parity against the pure-Python spec
and the reference library (the native core must be byte-exact or absent)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from .helpers import MAX_EXAMPLES, PAT_NAMES, make_encoding, make_mixed_corpus, make_oracle


@pytest.fixture(scope="module")
def native_available():
    from tiktoken_tpu.native import load_library

    if load_library() is None:
        pytest.skip("native core unavailable (no compiler)")
    return True


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_native_matches_oracle_corpus(native_available, pat_name):
    from tests.helpers import pat_str, trained_ranks
    from tiktoken_tpu.native import NativeCore

    nc = NativeCore(pat_str(pat_name), trained_ranks(pat_name))
    oracle = make_oracle(pat_name)
    for seed in range(4):
        t = make_mixed_corpus(4000, seed=seed)
        assert nc.encode_ordinary(t) == oracle.encode_ordinary(t)
    for t in ["", "x", "hello world", "a\nb\r\nc  d", "0" * 40,
              "x" * 5000, "  " * 300, "🌍🚀" * 20, "A\U000323b0", "'s 'LL"]:
        assert nc.encode_ordinary(t) == oracle.encode_ordinary(t), repr(t)


@pytest.mark.parametrize("pat_name", ["o200k"])
@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(text=st.text(max_size=200))
def test_native_fuzz(native_available, pat_name, text):
    enc = make_encoding(pat_name)  # host engine uses native when available
    oracle = make_oracle(pat_name)
    assert enc.encode_ordinary(text) == oracle.encode_ordinary(text)


def test_native_heap_path_large_pieces(native_available):
    """Pieces >= 512 bytes take the heap merge; must agree with the oracle
    (the reference needs its own heap variant for the same reason)."""
    enc = make_encoding("cl100k")
    oracle = make_oracle("cl100k")
    for s in ["x" * 100_000, "0" * 2000, " " * 1500, "ab" * 5000]:
        assert enc.encode_ordinary(s) == oracle.encode_ordinary(s)


def test_python_fallback_matches(native_available):
    """TIKTOKEN_TPU_NO_NATIVE must produce identical tokens via _pybpe."""
    code = """
import sys
sys.path.insert(0, %r)
from tests.helpers import make_encoding, make_mixed_corpus
enc = make_encoding("o200k")
assert enc._core_bpe._native_core() is False or enc._core_bpe._native_core() is None \
    or __import__("os").environ.get("TIKTOKEN_TPU_NO_NATIVE")
t = make_mixed_corpus(2000, seed=3)
print(",".join(map(str, enc.encode_ordinary(t)[:50])))
""" % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)
    env = dict(os.environ, TIKTOKEN_TPU_NO_NATIVE="1", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    enc = make_encoding("o200k")
    t = make_mixed_corpus(2000, seed=3)
    assert out.stdout.strip() == ",".join(map(str, enc.encode_ordinary(t)[:50]))


@given(st.binary(min_size=0, max_size=4000), st.sampled_from([40, 64, 176]))
@settings(max_examples=MAX_EXAMPLES, deadline=None)
def test_native_pack_cuts_match_numpy(data, K):
    """ttpu_pack_cuts3 is bit-exact with the numpy cut computation on
    valid UTF-8 (the packer may receive any of the engine's document
    bytes, always utf-8-encoded str)."""
    import numpy as np

    from tiktoken_tpu.native import load_library, pack_cuts3
    from tiktoken_tpu.ops.pipeline3 import DIGIT_BACKUP, _doc_cuts_np

    if load_library() is None:
        pytest.skip("native core unavailable")
    # make it valid UTF-8 (the packer's input domain)
    data = data.decode("utf-8", errors="replace").encode("utf-8")
    arr = np.frombuffer(data, np.uint8)
    if len(arr) <= K:
        return
    got = pack_cuts3(arr, K, DIGIT_BACKUP)
    assert got is not None
    assert np.array_equal(got, _doc_cuts_np(arr, K))


def test_native_pack_cuts_digit_runs(native_available):
    """Phase-locked digit runs: backup respected, forward progress kept."""
    import numpy as np

    from tiktoken_tpu.native import pack_cuts3
    from tiktoken_tpu.ops.pipeline3 import DIGIT_BACKUP, _doc_cuts_np

    for doc in [
        b"7" * 5000,                       # one giant run: raw cuts stay in-run
        (b"abc " + b"9" * 30) * 300,       # runs shorter than the backup
        (b"x" * 170 + b"12345678901234567890123456789012345678901234567890") * 40,
        "東京1234567890".encode() * 400,
    ]:
        arr = np.frombuffer(doc, np.uint8)
        got = pack_cuts3(arr, 176, DIGIT_BACKUP)
        assert np.array_equal(got, _doc_cuts_np(arr, 176)), doc[:40]
