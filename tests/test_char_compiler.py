"""Char-level pattern compilation (groundwork for future char-level device
scanners; see docs/ROADMAP.md): split parity against the byte-level DFA,
and the streaming transducer over the r50k char DFA (cl100k/o200k
transducers are known to explode — the builder must say so, not loop)."""

from __future__ import annotations

import numpy as np
import pytest

from .helpers import PAT_NAMES, make_mixed_corpus, pat_str


@pytest.mark.parametrize("pat_name", PAT_NAMES)
def test_char_dfa_split_parity(pat_name):
    from tiktoken_tpu.ops.regex_compiler import (
        compile_pattern,
        compile_pattern_chars,
        scan_bytes,
        scan_codepoints,
    )

    cdfa = compile_pattern_chars(pat_str(pat_name))
    bdfa = compile_pattern(pat_str(pat_name))
    assert cdfa.n_states < 64  # the whole point: tiny at char level
    for seed in range(3):
        text = make_mixed_corpus(2500, seed=seed)
        cstarts = scan_codepoints(cdfa, text)
        blen = np.asarray([len(ch.encode()) for ch in text])
        cum = np.concatenate([[0], np.cumsum(blen)])
        got = [int(cum[i]) for i in cstarts]
        assert got == scan_bytes(bdfa, text.encode())


def test_char_transducer_r50k():
    from tiktoken_tpu.ops.regex_compiler import compile_pattern_chars
    from tiktoken_tpu.ops.scanner import build_transducer_chars, ScannerTransducer

    cdfa = compile_pattern_chars(pat_str("r50k"))
    td = build_transducer_chars(cdfa)
    assert td.n_states < 64
    # run it over a class stream and check boundaries vs the direct scan
    from tiktoken_tpu.ops.regex_compiler import scan_codepoints
    from tiktoken_tpu.ops.scanner import scan_transducer_numpy

    text = make_mixed_corpus(1500, seed=7)
    classes = np.asarray(
        [cdfa.class_of_cp(ord(ch)) for ch in text] + [cdfa.eof_class]
    )
    bits, err = scan_transducer_numpy(td, classes)
    assert not err
    got = [0] + [int(i) for i in np.nonzero(bits[: len(text)])[0] if i != 0]
    assert got == scan_codepoints(cdfa, text)


def test_char_transducer_explodes_loudly_on_cl100k():
    from tiktoken_tpu.ops.regex_compiler import compile_pattern_chars
    from tiktoken_tpu.ops.scanner import build_transducer_chars

    cdfa = compile_pattern_chars(pat_str("cl100k"))
    with pytest.raises((RuntimeError, AssertionError)):
        build_transducer_chars(cdfa, max_states=50_000)
