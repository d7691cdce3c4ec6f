"""Char-level pattern compilation: split parity against the byte-level
DFA. The char DFA is the production scanner now (ops/charclass +
ops/sweep_scan); the byte-level transducer exploration it grew out of was
pruned once this shipped."""

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
