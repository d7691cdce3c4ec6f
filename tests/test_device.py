"""Device pipeline end-to-end: byte-exact parity with the host oracle.

Runs the full jitted pipeline (class map -> scanner transducer -> merge
rounds -> compaction) on the test backend (CPU here; the same code path
runs on TPU) and compares token ids against Encoding.encode_ordinary and
the installed reference.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from .helpers import (
    DEVICE_PAT_NAMES,
    MAX_EXAMPLES,
    make_encoding,
    make_mixed_corpus,
    make_oracle,
)


def _corpus_docs():
    return [
        make_mixed_corpus(9_000, seed=21),
        make_mixed_corpus(3_000, seed=22),
        "short one",
        "it's 12345 naïve café 東京 🌍\n\nnew paragraph here\nand more",
        "",
        "x" * 5000,  # single piece longer than a row: hard-cut fallback
        ("line of text\n" * 400),  # many safe splits
    ]


@pytest.mark.parametrize("pat_name", DEVICE_PAT_NAMES)
def test_encode_corpus_matches_host(pat_name):
    enc = make_encoding(pat_name)
    docs = _corpus_docs()
    got = enc.encode_corpus(docs, strategy="device")
    want = [enc.encode_ordinary(d) for d in docs]
    for g, w, d in zip(got, want, docs):
        assert g == w, (pat_name, d[:50])


@pytest.mark.parametrize("pat_name", DEVICE_PAT_NAMES)
def test_encode_corpus_matches_reference(pat_name):
    enc = make_encoding(pat_name)
    oracle = make_oracle(pat_name)
    docs = [make_mixed_corpus(6_000, seed=31), "hello world, it's 42\nnew line"]
    got = enc.encode_corpus(docs, strategy="device")
    want = oracle.encode_ordinary_batch(docs)
    assert got == want


@pytest.mark.parametrize("pat_name", DEVICE_PAT_NAMES)
@settings(max_examples=MAX_EXAMPLES // 4, deadline=None)
@given(text=st.text(max_size=300))
def test_encode_corpus_fuzz(pat_name, text):
    enc = make_encoding(pat_name)
    try:
        text.encode("utf-8")
    except UnicodeEncodeError:
        return
    got = enc.encode_corpus([text], strategy="device")
    assert got == [enc.encode_ordinary(text)]


def test_small_row_capacity_forces_splits():
    """Tiny rows exercise the safe-split/lookahead machinery heavily."""
    from tiktoken_tpu.ops.engine import DeviceEngine, pack_documents

    enc = make_encoding("cl100k")
    doc = ("hello world\nthis is line two\nx y z 123\n" * 30).encode()
    batch = pack_documents([doc], row_capacity=64)
    assert batch.rows.shape[0] > 10
    assert not batch.hard_cut_docs
    engine = enc.device_engine
    packed, counts, err = engine.encode_rows(batch)
    assert not err.any()
    toks = [int(t) for row in range(packed.shape[0]) for t in packed[row, : counts[row]]]
    assert toks == enc.encode_ordinary(doc.decode())


def test_invalid_utf8_rows_fall_back():
    enc = make_encoding("cl100k")
    # Bypass the str API to feed raw invalid bytes.
    got = enc.device_engine.encode_corpus(
        ["good text here"], host_fallback=enc._core_bpe
    )
    assert got == [enc.encode_ordinary("good text here")]


def test_packer_row_shapes():
    from tiktoken_tpu.ops.engine import LOOK, pack_documents

    doc = ("abc def\n" * 100).encode()
    batch = pack_documents([doc], row_capacity=128)
    assert batch.rows.shape[1] == 128 + LOOK
    # payloads concatenate to the doc
    total = b"".join(
        batch.rows[i, : batch.n_payload[i]].tobytes() for i in range(batch.rows.shape[0])
    )
    assert total == doc


def test_special_token_text_is_ordinary_on_device():
    """encode_corpus has encode_ordinary semantics: special-token TEXT in a
    document is tokenized as plain text by the device pipeline too."""
    enc = make_encoding("cl100k")
    oracle = make_oracle("cl100k")
    docs = [
        "before <|endoftext|> after",
        "<|endoftext|>" * 10,
        "x<|im_start|>y<|fim_prefix|>z",
    ]
    got = enc.encode_corpus(docs, strategy="device")
    assert got == [oracle.encode_ordinary(d) for d in docs]


def test_pack_documents_reconstructs_payloads():
    """Row payloads concatenate back to each document, for any length."""
    import numpy as np

    from tiktoken_tpu.ops.engine import pack_documents

    rng = __import__("random").Random(3)
    docs = []
    for K in (64, 256):
        for n in (0, 1, K - 1, K, K + 1, 2 * K, 5 * K + 7):
            docs = [make_mixed_corpus(n, seed=n).encode()[:n] for n in
                    (0, 1, K - 1, K, K + 1, 2 * K, 5 * K + 7)]
            batch = pack_documents(docs, K)
            rebuilt = {}
            for r in range(batch.rows.shape[0]):
                d = int(batch.doc_index[r])
                rebuilt.setdefault(d, bytearray()).extend(
                    batch.rows[r, : batch.n_payload[r]].tobytes()
                )
            for d, doc in enumerate(docs):
                if len(doc):
                    assert bytes(rebuilt[d]) == doc, (K, d)
                assert all(batch.n_payload[batch.doc_index == d] <= K)
