"""Compiled-artifact caching.

Pattern compilation (regex -> scanner DFA) and vocab compilation (rank
table -> device arrays) are deterministic and moderately expensive, so we
cache them on disk next to the vocab cache, the same way the reference
caches downloaded vocab files (reference: tiktoken/load.py:35-86). Keys
include the compiler version and the Unicode data version so stale
artifacts are never reused.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

import numpy as np

COMPILER_VERSION = 5  # bump to invalidate every cached artifact


def _artifact_dir() -> str | None:
    for var in ("TIKTOKEN_TPU_CACHE_DIR", "TIKTOKEN_CACHE_DIR", "DATA_GYM_CACHE_DIR"):
        if var in os.environ:
            d = os.environ[var]
            if d == "":
                return None
            return os.path.join(d, "compiled")
    # XDG-style home cache: /tmp is routinely wiped between process
    # lifetimes, and losing the executable cache costs minutes of TPU
    # compile time at the next startup (the reference keeps its vocab
    # cache in tempdir, tiktoken/load.py:35-47, but its equivalent cold
    # cost is seconds, not minutes). Fall back to tempdir when home is
    # unavailable (e.g. sandboxed CI).
    home = os.path.expanduser("~")
    if home and home != "~" and os.path.isdir(home):
        return os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.join(home, ".cache")),
            "tiktoken-tpu", "compiled",
        )
    return os.path.join(tempfile.gettempdir(), "tiktoken-tpu-compiled")


def artifact_key(kind: str, payload: bytes) -> str:
    import unicodedata

    meta = f"{kind}:v{COMPILER_VERSION}:u{unicodedata.unidata_version}:".encode()
    return hashlib.sha256(meta + payload).hexdigest()


def load_arrays(key: str) -> dict[str, np.ndarray] | None:
    d = _artifact_dir()
    if d is None:
        return None
    path = os.path.join(d, key + ".npz")
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    except Exception:
        try:
            os.remove(path)
        except OSError:
            pass
        return None


def store_arrays(key: str, arrays: dict[str, np.ndarray]) -> None:
    d = _artifact_dir()
    if d is None:
        return
    try:
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, key + ".npz")
        tmp = f"{path}.{uuid.uuid4()}.tmp"
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.rename(tmp, path)
    except OSError:
        pass  # caching is best-effort, like the reference's vocab cache


_exec_cache_enabled = False


def enable_executable_cache() -> bool:
    """Point jax's persistent compilation cache at the artifact dir.

    The device pipeline's production programs take minutes to compile on
    the TPU backend; caching the compiled executables on disk (keyed by
    jax on HLO + compiler version) turns every later process start into
    a cache read — the executable-level analog of the array caches above
    (the reference's equivalent cost, CoreBPE construction, is cached the
    same way: tiktoken/load.py:35-86). Gated off XLA:CPU, where
    executable serialization segfaults (put_executable_and_time crash,
    see tests/conftest.py). Returns True if the cache is active.
    """
    global _exec_cache_enabled
    if _exec_cache_enabled:
        return True
    if os.environ.get("TIKTOKEN_TPU_EXEC_CACHE", "1") in ("0", "false"):
        return False
    d = _artifact_dir()
    if d is None:
        return False
    import jax

    try:
        if jax.default_backend() == "cpu":
            return False
        os.makedirs(os.path.join(d, "xla"), exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", os.path.join(d, "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return False
    _exec_cache_enabled = True
    return True


def cached_scanner_dfa(pat_str: str):
    """Disk-cached :func:`tiktoken_tpu.ops.regex_compiler.compile_pattern`."""
    from tiktoken_tpu.ops.regex_compiler import ScannerDFA, compile_pattern

    key = artifact_key("scanner-dfa", pat_str.encode())
    arrays = load_arrays(key)
    if arrays is not None:
        return ScannerDFA(
            trans=arrays["trans"],
            accept=arrays["accept"],
            class_of=arrays["class_of"],
            n_states=int(arrays["trans"].shape[0]),
            n_classes=int(arrays["trans"].shape[1]),
            pat_str=pat_str,
        )
    dfa = compile_pattern(pat_str)
    store_arrays(
        key,
        {"trans": dfa.trans, "accept": dfa.accept, "class_of": dfa.class_of},
    )
    return dfa


def cached_char_class_tables(pat_str: str):
    """Disk-cached char-level DFA + page-compressed class tables
    (ops/charclass.build_char_class_tables over compile_pattern_chars)."""
    from tiktoken_tpu.ops.charclass import CharClassTables
    from tiktoken_tpu.ops.regex_compiler import compile_pattern_chars

    key = artifact_key("char-class-tables", pat_str.encode())
    arrays = load_arrays(key)
    if arrays is not None:
        meta = arrays["meta"]
        return CharClassTables(
            page_entry=arrays["page_entry"],
            mixed_rows=arrays["mixed_rows"],
            n_classes=int(meta[0]),
            eof_class=int(meta[1]),
            n_states=int(meta[2]),
            trans=arrays["trans"],
            accept=arrays["accept"],
        )
    from tiktoken_tpu.ops.charclass import build_char_class_tables

    tables = build_char_class_tables(compile_pattern_chars(pat_str))
    store_arrays(
        key,
        {
            "page_entry": tables.page_entry,
            "mixed_rows": tables.mixed_rows,
            "trans": tables.trans,
            "accept": tables.accept,
            "meta": np.asarray(
                [tables.n_classes, tables.eof_class, tables.n_states], np.int64
            ),
        },
    )
    return tables
