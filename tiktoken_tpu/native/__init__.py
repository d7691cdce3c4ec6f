"""ctypes loader for the native host core (core.cpp).

Compiled on first use with the system g++ (-O3) and cached next to the
other compiled artifacts, keyed by the source hash — the same lazy,
cache-once model as the DFA/vocab table compilation. Everything degrades
gracefully: if no compiler is available the host engine silently stays on
the pure-Python path (tiktoken_tpu/_pybpe.py), which is the semantic spec
the native core is differentially tested against.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
import tempfile

import numpy as np

_LIB = None
_LIB_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "core.cpp")


def _artifact_dir() -> str:
    from tiktoken_tpu.ops.artifacts import _artifact_dir as d

    return d() or os.path.join(tempfile.gettempdir(), "tiktoken-tpu-compiled")


def load_library():
    """Compile (once) and load the native core; None if unavailable."""
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if os.environ.get("TIKTOKEN_TPU_NO_NATIVE"):
        return None
    try:
        # prebuilt wheel artifact first (setup.py builds the core as
        # tiktoken_tpu/native/_ttpu_core*.so): installs on compiler-less
        # hosts still get the fast host engine
        so_path = None
        import glob as _glob

        prebuilt = sorted(
            _glob.glob(os.path.join(os.path.dirname(_SRC), "_ttpu_core*.so"))
        )
        if prebuilt and not os.environ.get("TIKTOKEN_TPU_NO_PREBUILT"):
            so_path = prebuilt[0]
        else:
            with open(_SRC, "rb") as f:
                src = f.read()
            tag = hashlib.sha256(src).hexdigest()[:16]
            d = _artifact_dir()
            os.makedirs(d, exist_ok=True)
            so_path = os.path.join(d, f"ttpu_core_{tag}.so")
            if not os.path.exists(so_path):
                tmp = so_path + f".{os.getpid()}.tmp"
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-pthread"]
                    + (["-msse4.2"]
                       if platform.machine() in ("x86_64", "AMD64") else [])
                    + [_SRC, "-o", tmp],
                    check=True, capture_output=True, timeout=300,
                )
                os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.ttpu_new.restype = ctypes.c_void_p
        lib.ttpu_new.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.ttpu_free.argtypes = [ctypes.c_void_p]
        lib.ttpu_encode.restype = ctypes.c_int64
        lib.ttpu_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.ttpu_encode_piece.restype = ctypes.c_int64
        lib.ttpu_encode_piece.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.ttpu_decode.restype = ctypes.c_int64
        lib.ttpu_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        if hasattr(lib, "ttpu_pack_cuts3"):  # absent in older prebuilts
            lib.ttpu_pack_cuts3.restype = ctypes.c_int64
            lib.ttpu_pack_cuts3.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ]
        lib.ttpu_encode_batch.restype = ctypes.c_int64
        lib.ttpu_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def pack_cuts3(data: np.ndarray, K: int, backup: int):
    """Native handshake-cut positions for one document's bytes, or None
    when the native core (or the symbol, in an older prebuilt) is
    unavailable. Bit-exact with pack_corpus3's numpy cut computation on
    valid UTF-8 (differentially tested)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "ttpu_pack_cuts3"):
        return None
    n = len(data)
    cap = (n - 1) // K + 1 if n > 0 else 1
    out = np.empty(cap, dtype=np.int64)
    data = np.ascontiguousarray(data)
    m = lib.ttpu_pack_cuts3(
        data.ctypes.data, n, K, backup, out.ctypes.data, cap
    )
    if m < 0:
        return None
    return out[:m]


class NativeCore:
    """Handle around one compiled (pat_str, vocab) native engine."""

    def __init__(self, pat_str: str, mergeable_ranks: dict[bytes, int]):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native core unavailable")
        from tiktoken_tpu.ops import artifacts
        from tiktoken_tpu.ops.window_scan import pack_trans_accept

        dfa = artifacts.cached_scanner_dfa(pat_str)
        from tiktoken_tpu.ops.window_scan import expand_packed_to_bytes

        # byte-expanded table padded to a 512 stride with PRE-MULTIPLIED
        # next-state bases: the C++ scan step is idx = base | byte, one
        # load, no multiply (column 256 = EOF, 257..511 dead padding)
        pb = expand_packed_to_bytes(
            pack_trans_accept(dfa.trans, dfa.accept), dfa.class_of
        ).astype(np.int64)
        nxt = pb >> 5
        acc = pb & 31
        pb512 = np.zeros((dfa.n_states, 512), dtype=np.int64)
        pb512[:, :257] = ((nxt * 512) << 5) | acc
        assert pb512.max() < 2**31
        packed = np.ascontiguousarray(pb512, dtype=np.int32)
        class_of = np.ascontiguousarray(np.arange(257), dtype=np.uint16)

        toks = sorted(mergeable_ranks.items(), key=lambda kv: kv[1])
        blob = b"".join(t for t, _ in toks)
        offs = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum([len(t) for t, _ in toks], out=offs[1:])
        rank_arr = np.asarray([r for _, r in toks], dtype=np.uint32)
        blob_arr = np.frombuffer(blob, dtype=np.uint8) if blob else np.zeros(0, np.uint8)

        self._lib = lib
        self._keepalive = (packed, class_of, blob_arr, offs, rank_arr)
        self._h = lib.ttpu_new(
            packed.ctypes.data, dfa.n_states, 512, class_of.ctypes.data,
            blob_arr.ctypes.data if len(blob_arr) else None,
            offs.ctypes.data, rank_arr.ctypes.data, len(toks),
        )
        if not self._h:
            raise RuntimeError("native core init failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.ttpu_free(h)
            self._h = None

    def encode_ordinary(self, text: str) -> list[int]:
        data = text.encode("utf-8")
        return self.encode_ordinary_bytes(data)

    def encode_ordinary_bytes(self, data: bytes) -> list[int]:
        return self.encode_with_lptl(data)[0]

    def encode_with_lptl(self, data: bytes) -> tuple[list[int], int]:
        """(tokens, last_piece_token_len) for one special-free segment."""
        if not data:
            return [], 0
        cap = len(data) + 2
        out = np.empty(cap, dtype=np.uint32)
        lptl = ctypes.c_int64(0)
        n = self._lib.ttpu_encode(
            self._h, data, len(data), out.ctypes.data, cap, ctypes.byref(lptl)
        )
        if n < 0 or n > cap or (n and out[:n].max() == 0xFFFFFFFF):
            raise RuntimeError("native encode failed")
        return out[:n].tolist(), int(lptl.value)

    def encode_ordinary_numpy(self, data: bytes) -> np.ndarray:
        """Zero-copy encode: token ids as a uint32 view over the buffer
        the C core wrote into (no Python list materialization; the
        reference's TiktokenBuffer analog, reference: src/py.rs:186-248)."""
        if not data:
            return np.empty(0, dtype=np.uint32)
        cap = len(data) + 2
        out = np.empty(cap, dtype=np.uint32)
        lptl = ctypes.c_int64(0)
        n = self._lib.ttpu_encode(
            self._h, data, len(data), out.ctypes.data, cap, ctypes.byref(lptl)
        )
        if n < 0 or n > cap or (n and out[:n].max() == 0xFFFFFFFF):
            raise RuntimeError("native encode failed")
        return out[:n]

    def encode_piece(self, piece: bytes) -> list[int]:
        cap = len(piece) + 2
        out = np.empty(cap, dtype=np.uint32)
        n = self._lib.ttpu_encode_piece(self._h, piece, len(piece), out.ctypes.data, cap)
        return out[:n].tolist()

    def decode_bytes(self, tokens) -> bytes:
        """Concatenated token bytes; raises KeyError on non-ordinary ids
        (the caller resolves special tokens first)."""
        ids = np.ascontiguousarray(tokens, dtype=np.uint32)
        n = len(ids)
        if n == 0:
            return b""
        cap = int(n) * 16
        buf = ctypes.create_string_buffer(cap)
        r = self._lib.ttpu_decode(self._h, ids.ctypes.data, n, buf, cap)
        if r > cap:
            cap = int(r)
            buf = ctypes.create_string_buffer(cap)
            r = self._lib.ttpu_decode(self._h, ids.ctypes.data, n, buf, cap)
        if r < 0:
            raise KeyError(int(ids[-1 - r]))
        return buf.raw[:r]

    def encode_ordinary_batch_arrays(
        self, texts, num_threads: int = 8
    ) -> tuple[np.ndarray, np.ndarray]:
        """Natively threaded batch encode with array output: one C call,
        the thread pool lives below the language boundary, and the result
        is ``(tokens, offsets)`` — document ``i``'s ids are
        ``tokens[offsets[i]:offsets[i+1]]`` (uint32 / int64). No Python
        int materialization: at corpus scale the per-token PyLong +
        list-of-lists churn costs more than the tokenization itself
        (the corpus-size analog of the reference's zero-copy buffer,
        reference: src/py.rs:186-248)."""
        datas = [t.encode("utf-8") for t in texts]
        n = len(datas)
        if n == 0:
            return np.empty(0, np.uint32), np.zeros(1, np.int64)
        doc_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum([len(d) for d in datas], out=doc_offs[1:])
        blob = b"".join(datas)
        out_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum([len(d) + 2 for d in datas], out=out_offs[1:])
        out = np.empty(int(out_offs[-1]), dtype=np.uint32)
        counts = np.zeros(n, dtype=np.int64)
        rc = self._lib.ttpu_encode_batch(
            self._h, blob, doc_offs.ctypes.data, n,
            out.ctypes.data, out_offs.ctypes.data, counts.ctypes.data,
            int(num_threads),
        )
        if rc != 0:
            raise RuntimeError("native batch encode failed")
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        flat = np.empty(int(offs[-1]), dtype=np.uint32)
        for d in range(n):
            flat[offs[d] : offs[d + 1]] = out[out_offs[d] : out_offs[d] + counts[d]]
        # the error sentinel (RANK_MAX) can never be a real token id
        if flat.size and int(flat.max()) == 0xFFFFFFFF:
            raise RuntimeError("native encode failed")
        return flat, offs

    def encode_ordinary_batch(self, texts, num_threads: int = 8):
        """Natively threaded batch encode: one C call, the thread pool
        lives below the language boundary (no Python thread overhead)."""
        flat, offs = self.encode_ordinary_batch_arrays(texts, num_threads)
        return [
            flat[offs[d] : offs[d + 1]].tolist() for d in range(len(offs) - 1)
        ]
