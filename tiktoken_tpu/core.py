"""The public ``Encoding`` API.

API-compatible with the reference library's ``Encoding`` class
(reference: tiktoken/core.py:16-428): same constructor signature, method
names, defaults, error types and messages. The implementation differs: the
engine behind it is the host oracle (``_pybpe.HostBPE``) for latency-bound
calls and the TPU device pipeline (``tiktoken_tpu.ops``) for
throughput-bound batch/corpus work.
"""

from __future__ import annotations

import functools
from concurrent.futures import ThreadPoolExecutor
from typing import TYPE_CHECKING, AbstractSet, Collection, Literal, NoReturn, Sequence

from tiktoken_tpu._pybpe import HostBPE

if TYPE_CHECKING:
    import re

    import numpy as np
    import numpy.typing as npt


class Encoding:
    def __init__(
        self,
        name: str,
        *,
        pat_str: str,
        mergeable_ranks: dict[bytes, int],
        special_tokens: dict[str, int],
        explicit_n_vocab: int | None = None,
    ):
        """Build an encoding from its four defining pieces.

        ``tiktoken_tpu_ext/openai_public.py`` shows real constructions.

        Args:
            name: Identifier for this encoding; two encodings that
                tokenize differently (e.g. different special tokens) must
                not share a name.
            pat_str: The pre-tokenization split regex.
            mergeable_ranks: token bytes -> rank. Rank order doubles as
                merge priority, so the table fully determines BPE output.
            special_tokens: special token string -> id.
            explicit_n_vocab: Optional size cross-check; construction
                fails unless ranks + specials add up to exactly this and
                ids are dense up to it.
        """
        self.name = name

        self._pat_str = pat_str
        self._mergeable_ranks = mergeable_ranks
        self._special_tokens = special_tokens

        self.max_token_value = max(
            max(mergeable_ranks.values()), max(special_tokens.values(), default=0)
        )
        if explicit_n_vocab:
            assert len(mergeable_ranks) + len(special_tokens) == explicit_n_vocab
            assert self.max_token_value == explicit_n_vocab - 1

        self._special_token_values = set(self._special_tokens.values())

        # Host engine: exact semantics, used for latency-bound calls and as
        # the fallback for APIs that stay on the CPU.
        self._core_bpe = HostBPE(mergeable_ranks, special_tokens, pat_str)
        # Device engine: compiled lazily on first batch/corpus use.
        self._device_engine = None

    def __repr__(self) -> str:
        return f"<Encoding {self.name!r}>"

    # ====================
    # Device engine
    # ====================

    @property
    def device_engine(self):
        """The TPU pipeline for this encoding (built lazily and cached)."""
        if self._device_engine is None:
            from tiktoken_tpu.ops.engine import DeviceEngine
            from tiktoken_tpu.ops.regex_compiler import PatternError

            try:
                self._device_engine = DeviceEngine.build(
                    self._pat_str, self._mergeable_ranks, name=self.name
                )
            except PatternError as e:
                raise PatternError(
                    f"pat_str {self._pat_str!r} uses a construct outside "
                    f"the device scanner's dialect ({e}). Encode on the "
                    "host instead: encode_ordinary / encode_batch, or "
                    'encode_corpus(..., strategy="host") — host paths '
                    "accept any pattern the regex module compiles."
                ) from e
        return self._device_engine

    def warmup(self, **kwargs) -> None:
        """Pre-compile the device pipeline at its canonical geometry.

        First compiles take minutes on the target backend; deployments
        call this once at startup so ``encode_corpus`` never compiles on
        the request path. See ``DeviceEngine.warmup`` for knobs."""
        self.device_engine.warmup(**kwargs)


    def _resolve_specials(
        self,
        text: str | None,
        allowed_special,
        disallowed_special,
    ):
        """Resolve the "all" sentinels and police disallowed special tokens.

        Returns the resolved (allowed, disallowed) sets. When ``text`` is
        given and contains a disallowed special token, raises ``ValueError``
        with the same actionable message as the reference
        (reference: tiktoken/core.py:116-124, 441-449).
        """
        if allowed_special == "all":
            allowed_special = self.special_tokens_set
        if disallowed_special == "all":
            disallowed_special = self.special_tokens_set - allowed_special
        if disallowed_special:
            if not isinstance(disallowed_special, frozenset):
                disallowed_special = frozenset(disallowed_special)
            if text is not None:
                if match := _special_token_regex(disallowed_special).search(text):
                    raise_disallowed_special_token(match.group())
        return allowed_special, disallowed_special


    # ====================
    # Encoding
    # ====================

    def encode_ordinary(self, text: str) -> list[int]:
        """Tokenize ``text`` with special-token strings treated as plain
        text.

        Same result as ``encode(text, disallowed_special=())``, minus the
        policy machinery, so it is marginally faster.
        """
        try:
            return self._core_bpe.encode_ordinary(text)
        except UnicodeEncodeError:
            # See comment in encode.
            text = text.encode("utf-16", "surrogatepass").decode("utf-16", "replace")
            return self._core_bpe.encode_ordinary(text)

    def encode(
        self,
        text: str,
        *,
        allowed_special: Literal["all"] | AbstractSet[str] = set(),  # noqa: B006
        disallowed_special: Literal["all"] | Collection[str] = "all",
    ) -> list[int]:
        """Tokenize ``text``, mapping allowed special-token strings to
        their reserved ids.

        Because special tokens steer model behaviour, any special-token
        string appearing in untrusted input is a prompt-injection hazard
        — so by default this raises ``ValueError`` if one occurs in
        ``text``. Tune per token via the two sets:
        - ``disallowed_special=()``: never raise; special-token strings
          tokenize as ordinary text.
        - ``allowed_special="all"``: every special-token string becomes
          its reserved id.
        """
        allowed_special, _ = self._resolve_specials(text, allowed_special, disallowed_special)

        try:
            return self._core_bpe.encode(text, allowed_special)[0]
        except UnicodeEncodeError:
            # BPE operates on bytes, but the regex operates on unicode.
            # Fix up surrogate pairs that sneaked into the text; lone
            # surrogates become U+FFFD via errors="replace".
            text = text.encode("utf-16", "surrogatepass").decode("utf-16", "replace")
            return self._core_bpe.encode(text, allowed_special)[0]

    def encode_to_numpy(
        self,
        text: str,
        *,
        allowed_special: Literal["all"] | AbstractSet[str] = set(),  # noqa: B006
        disallowed_special: Literal["all"] | Collection[str] = "all",
    ) -> npt.NDArray[np.uint32]:
        """Encodes a string into tokens, returning a numpy uint32 array.

        With the native core and no special tokens in play, the result is
        a zero-copy view over the buffer the C core filled (the
        reference's buffer-protocol path, reference: src/py.rs:186-248 /
        tiktoken/core.py:138-162) — no Python list is materialized."""
        import numpy as np

        allowed_special, _ = self._resolve_specials(
            text, allowed_special, disallowed_special
        )
        native = self._core_bpe._native_core()
        if native and not (
            allowed_special
            and _special_token_regex(frozenset(allowed_special)).search(text)
        ):
            try:
                return native.encode_ordinary_numpy(text.encode("utf-8"))
            except UnicodeEncodeError:
                fixed = text.encode("utf-16", "surrogatepass").decode(
                    "utf-16", "replace"
                )
                return native.encode_ordinary_numpy(fixed.encode("utf-8"))
            except RuntimeError:
                pass
        try:
            tokens = self._core_bpe.encode(text, allowed_special)[0]
        except UnicodeEncodeError:
            text = text.encode("utf-16", "surrogatepass").decode("utf-16", "replace")
            tokens = self._core_bpe.encode(text, allowed_special)[0]
        return np.asarray(tokens, dtype=np.uint32)

    def encode_ordinary_batch(self, text: list[str], *, num_threads: int = 8) -> list[list[int]]:
        """Batch ``encode_ordinary`` over a document list, in parallel.

        Same result as ``encode_batch(text, disallowed_special=())``. With
        the native core the thread pool lives below the language boundary
        (one C call); texts needing the surrogate fixup or environments
        without a compiler use GIL-releasing Python threads instead.
        """
        native = self._core_bpe._native_core()
        if native:
            try:
                return native.encode_ordinary_batch(text, num_threads=num_threads)
            except (UnicodeEncodeError, RuntimeError):
                pass
        encoder = functools.partial(self.encode_ordinary)
        with ThreadPoolExecutor(num_threads) as e:
            return list(e.map(encoder, text))

    def encode_batch(
        self,
        text: list[str],
        *,
        num_threads: int = 8,
        allowed_special: Literal["all"] | AbstractSet[str] = set(),  # noqa: B006
        disallowed_special: Literal["all"] | Collection[str] = "all",
    ) -> list[list[int]]:
        """Batch ``encode`` over a document list, in parallel.

        The special-token policy sets work exactly as in ``encode``.
        """
        allowed_special, disallowed_special = self._resolve_specials(
            None, allowed_special, disallowed_special
        )
        if not isinstance(disallowed_special, frozenset):
            disallowed_special = frozenset(disallowed_special)

        encoder = functools.partial(
            self.encode, allowed_special=allowed_special, disallowed_special=disallowed_special
        )
        with ThreadPoolExecutor(num_threads) as e:
            return list(e.map(encoder, text))

    def _device_encode(self, texts, row_capacity=None, as_numpy=False,
                       chunk_rows=None):
        """Route to the newest device pipeline: v3 (handshake rows,
        ops/pipeline3) when char-level tables are enabled, else v2.
        TIKTOKEN_TPU_PIPELINE=2 forces v2."""
        import os

        eng = self.device_engine
        if (
            eng.char_tables is not None
            and os.environ.get("TIKTOKEN_TPU_PIPELINE", "3") != "2"
        ):
            try:
                return eng.encode_corpus3(
                    texts, host_fallback=self._core_bpe, K=row_capacity,
                    as_numpy=as_numpy, chunk_rows=chunk_rows,
                )
            except Exception as e:  # compile-capacity degradation below
                # Large chunk geometries can exceed the compile service's
                # resource limits on constrained hosts (observed: the
                # C=32768 program's AOT helper SIGKILLed while C<=8192
                # compiles fine, HARDWARE.md round 5). Encoding is pure,
                # so retry the whole corpus one tier smaller rather than
                # surfacing an INTERNAL compile error for a recoverable
                # capacity problem. Never silent: a warning names both
                # geometries.
                msg = str(e)
                is_compile = type(e).__name__ == "JaxRuntimeError" and (
                    "compile" in msg.lower() or "RESOURCE_EXHAUSTED" in msg
                )
                if not is_compile:
                    raise
                from tiktoken_tpu.ops.engine import (
                    _CHUNK_TIERS,
                    DEFAULT_CHUNK_ROWS,
                )

                cur = chunk_rows or DEFAULT_CHUNK_ROWS
                smaller = [t for t in _CHUNK_TIERS if 2048 <= t < cur]
                if not smaller:
                    raise
                nxt = max(smaller)
                import warnings

                warnings.warn(
                    f"device pipeline compile failed at chunk_rows={cur} "
                    f"({msg.splitlines()[0][:120]}); retrying at "
                    f"chunk_rows={nxt}",
                    stacklevel=2,
                )
                return self._device_encode(
                    texts, row_capacity, as_numpy=as_numpy, chunk_rows=nxt
                )
        kwargs = {} if row_capacity is None else {"row_capacity": row_capacity}
        out = eng.encode_corpus(texts, host_fallback=self._core_bpe, **kwargs)
        if as_numpy:
            import numpy as np

            out = [np.asarray(x, dtype=np.uint32) for x in out]
        return out

    def resolve_corpus_strategy(
        self, strategy: str = "auto", *, device: bool = True
    ) -> str:
        """The concrete engine strategy ``encode_corpus`` will run.

        "auto" resolves to "hybrid" when both the native host core and
        a non-CPU accelerator are present AND there is more than one
        host core: the shared work queue self-balances to each engine's
        throughput, but the device worker's host-side share (pack,
        upload/fetch threads, assembly — measured ~60 ms of host CPU
        per device MB on the round-4 tunnel box) must come from
        somewhere, and on a single core it comes straight out of the
        host engine's budget. Measured on that box (64 MB corpus,
        median of 3): host-only 45.2 MB/s numpy-out vs hybrid 33.7 —
        the device's marginal value is negative when it steals the only
        core, so 1-core hosts run host-only. Hosts whose JAX backend is
        CPU-only also run host-only — compiling the production chunk
        geometry on XLA:CPU takes tens of minutes and contributes
        nothing. Hosts without a C++ toolchain run device-only."""
        if strategy not in ("auto", "host", "device", "hybrid"):
            raise ValueError(
                f"unknown corpus strategy {strategy!r}; expected one of "
                "'auto', 'host', 'device', 'hybrid'"
            )
        if strategy != "auto":
            return strategy
        if not device:
            return "host"
        if not self._core_bpe._native_core():
            return "device"
        try:
            import jax

            platform = jax.default_backend()
        except Exception:
            platform = "cpu"
        if platform == "cpu":
            return "host"
        import os as _os

        return "hybrid" if (_os.cpu_count() or 1) > 1 else "host"

    def encode_corpus(
        self,
        texts: Sequence[str] | Sequence[bytes],
        *,
        device: bool = True,
        row_capacity: int | None = None,
        strategy: str = "auto",
        chunk_rows: int | None = None,
    ) -> list[list[int]]:
        """Encodes a large batch of documents at maximum node throughput.

        ``strategy``:
          - "auto" (default): pick per node — see
            ``resolve_corpus_strategy``. Hosts with both engines run
            hybrid (the queue self-balances, and the host worker's C
            call releases the GIL, so CPU and device overlap even on
            one core); CPU-only JAX backends run host-only; hosts
            without a C++ toolchain run the device pipeline.
          - "hybrid": device pipeline and the native host core pull
            documents from a shared queue concurrently — the host worker's
            ctypes call releases the GIL, so CPU and TPU overlap and the
            split self-balances to each engine's actual speed.
          - "device": everything through the TPU pipeline.
          - "host": everything through the host engine.

        All strategies are byte-exact with ``encode_ordinary``.
        """
        return self._encode_corpus_impl(
            texts, device=device, row_capacity=row_capacity,
            strategy=strategy, numpy_out=False, chunk_rows=chunk_rows,
        )

    def encode_corpus_to_numpy(
        self,
        texts: Sequence[str] | Sequence[bytes],
        *,
        device: bool = True,
        row_capacity: int | None = None,
        strategy: str = "auto",
        chunk_rows: int | None = None,
    ):
        """``encode_corpus`` with array output: ``(tokens, offsets)``
        where document ``i``'s ids are ``tokens[offsets[i]:offsets[i+1]]``
        (uint32 / int64).

        At corpus scale the ``list[list[int]]`` return of
        ``encode_corpus`` costs more than the tokenization itself
        (tens of millions of PyLongs + GC churn); this is the
        corpus-size analog of ``encode_to_numpy``
        (reference: tiktoken/core.py:138-162, src/py.rs:186-248)."""
        import numpy as np

        # host-strategy fast path: the native batch call already produces
        # exactly (tokens, offsets) — skip the per-doc view split and the
        # re-concatenation pass (two full extra passes over the output)
        native = self._core_bpe._native_core()
        resolved = self.resolve_corpus_strategy(strategy, device=device)
        if (not device or resolved == "host") and native:
            import os as _os

            docs = [t if isinstance(t, str) else t.decode("utf-8")
                    for t in texts]
            n_thr = max(1, min(32, _os.cpu_count() or 1))
            return native.encode_ordinary_batch_arrays(docs, n_thr)

        per_doc = self._encode_corpus_impl(
            texts, device=device, row_capacity=row_capacity,
            strategy=strategy, numpy_out=True, chunk_rows=chunk_rows,
        )
        offsets = np.zeros(len(per_doc) + 1, dtype=np.int64)
        np.cumsum([len(a) for a in per_doc], out=offsets[1:])
        tokens = (
            np.concatenate(per_doc).astype(np.uint32, copy=False)
            if per_doc else np.empty(0, np.uint32)
        )
        return tokens, offsets

    def _encode_corpus_impl(
        self, texts, *, device, row_capacity, strategy, numpy_out,
        chunk_rows=None,
    ):
        import numpy as np

        native = self._core_bpe._native_core()
        was_auto = strategy == "auto"
        strategy = self.resolve_corpus_strategy(strategy, device=device)
        if was_auto and strategy in ("device", "hybrid"):
            from tiktoken_tpu.ops.regex_compiler import PatternError

            try:
                self.device_engine
            except PatternError:
                # custom pattern outside the device dialect: auto quietly
                # keeps the corpus on the host engines (explicit
                # strategy="device" propagates the actionable error)
                strategy = "host"
        if not device or strategy == "host":
            import os as _os

            docs = [t if isinstance(t, str) else t.decode("utf-8") for t in texts]
            # the native batch path threads below the GIL: use every core
            # (matches the reference's own best multi-threaded config)
            n_thr = max(1, min(32, _os.cpu_count() or 1))
            if numpy_out and native:
                flat, offs = native.encode_ordinary_batch_arrays(docs, n_thr)
                return [flat[offs[d] : offs[d + 1]] for d in range(len(docs))]
            got = self.encode_ordinary_batch(docs, num_threads=n_thr)
            if numpy_out:
                got = [np.asarray(x, dtype=np.uint32) for x in got]
            return got
        if strategy == "device" or not native:
            return self._device_encode(
                texts, row_capacity, as_numpy=numpy_out, chunk_rows=chunk_rows
            )

        # hybrid: shared work queue, one device worker + one host worker
        import queue
        import threading

        texts = list(texts)
        out: list = [None] * len(texts)
        q: queue.Queue = queue.Queue()
        for i, t in enumerate(texts):
            q.put(i)
        def host_worker():
            import os as _os

            n_thr = max(1, min(32, (_os.cpu_count() or 1) - 1))
            while True:
                # small multi-doc grabs: the native batch call threads
                # below the GIL across all remaining cores
                idxs: list[int] = []
                while len(idxs) < max(1, 2 * n_thr):
                    try:
                        idxs.append(q.get_nowait())
                    except queue.Empty:
                        break
                if not idxs:
                    return
                docs = [
                    texts[i] if isinstance(texts[i], str)
                    else texts[i].decode("utf-8")
                    for i in idxs
                ]
                if numpy_out and native:
                    flat, offs = native.encode_ordinary_batch_arrays(docs, n_thr)
                    got = [flat[offs[d] : offs[d + 1]] for d in range(len(docs))]
                else:
                    got = self.encode_ordinary_batch(docs, num_threads=n_thr)
                    if numpy_out:
                        import numpy as _np

                        got = [_np.asarray(x, dtype=_np.uint32) for x in got]
                for i, toks in zip(idxs, got):
                    out[i] = toks

        def device_worker():
            # multi-document batches per device call: the dispatch+fetch
            # floor (~27ms, HARDWARE.md) would otherwise cap the device at
            # a few dozen docs/s regardless of size. Leave the queue's
            # tail to the host worker (a slow device grab at the end would
            # gate completion).
            import os as _os

            batch_bytes = int(
                _os.environ.get("TIKTOKEN_TPU_HYBRID_BATCH", 8 << 20)
            )
            while q.qsize() >= 4:
                # adaptive batch: never more than a third of the remaining
                # queue, so the host always has work and the final stretch
                # is never gated on one slow device grab
                take_docs = max(1, q.qsize() // 3)
                idxs: list[int] = []
                size = 0
                while size < batch_bytes and len(idxs) < take_docs:
                    try:
                        i = q.get_nowait()
                    except queue.Empty:
                        break
                    idxs.append(i)
                    t = texts[i]
                    size += len(t) if isinstance(t, (bytes, bytearray)) else len(t) * 2
                if not idxs:
                    return
                try:
                    got = self._device_encode(
                        [texts[i] for i in idxs], row_capacity,
                        as_numpy=numpy_out, chunk_rows=chunk_rows,
                    )
                    for i, toks in zip(idxs, got):
                        out[i] = toks
                except Exception:
                    # leave them None; the post-join sweep re-encodes them
                    return

        th = threading.Thread(target=host_worker)
        td = threading.Thread(target=device_worker)
        th.start(); td.start(); th.join(); td.join()
        # failure containment: anything a worker dropped is re-encoded on
        # the host path (exact), so a device-side error never loses a doc
        for i, toks in enumerate(out):
            if toks is None:
                t = texts[i]
                got = self.encode_ordinary(
                    t if isinstance(t, str) else t.decode("utf-8")
                )
                out[i] = np.asarray(got, dtype=np.uint32) if numpy_out else got
        return out

    def encode_with_unstable(
        self,
        text: str,
        *,
        allowed_special: Literal["all"] | AbstractSet[str] = set(),  # noqa: B006
        disallowed_special: Literal["all"] | Collection[str] = "all",
    ) -> tuple[list[int], list[list[int]]]:
        """Split ``text`` into a stable token prefix plus the set of
        token sequences its unstable tail could become.

        Tokens near the end of a string may re-merge with future text, so
        only a prefix of the ids is final; the completion lists cover
        every tokenization the tail could take once more text arrives.
        (The API surface itself carries no stability promise.)
        """
        allowed_special, _ = self._resolve_specials(text, allowed_special, disallowed_special)

        tokens, completions = self._core_bpe.encode_with_unstable(text, allowed_special)
        return tokens, [list(c) for c in completions]

    def encode_single_token(self, text_or_bytes: str | bytes) -> int:
        """Look up the id of one exact token (special tokens included,
        no policy check).

        ``KeyError`` if no token has these bytes.
        """
        if isinstance(text_or_bytes, str):
            text_or_bytes = text_or_bytes.encode("utf-8")
        return self._core_bpe.encode_single_token(text_or_bytes)

    # ====================
    # Decoding
    # ====================

    def decode_bytes(self, tokens: Sequence[int]) -> bytes:
        """Concatenate the byte values of ``tokens``."""
        return self._core_bpe.decode_bytes(tokens)

    def decode(self, tokens: Sequence[int], errors: str = "replace") -> str:
        """Decode ``tokens`` to a string.

        Token boundaries need not align with UTF-8 boundaries, so the
        concatenated bytes can be invalid UTF-8; the default
        ``errors="replace"`` silently substitutes U+FFFD there. Pass
        ``errors="strict"`` to surface such sequences as exceptions.
        """
        return self._core_bpe.decode_bytes(tokens).decode("utf-8", errors=errors)

    def decode_single_token_bytes(self, token: int) -> bytes:
        """Byte value of one token id (special ids included).

        ``KeyError`` for ids outside the vocabulary.
        """
        return self._core_bpe.decode_single_token_bytes(token)

    def decode_tokens_bytes(self, tokens: Sequence[int]) -> list[bytes]:
        """Per-token byte values, one ``bytes`` per id."""
        return [self.decode_single_token_bytes(token) for token in tokens]

    def decode_with_offsets(self, tokens: Sequence[int]) -> tuple[str, list[int]]:
        """Decode to text plus each token's starting character offset.

        A token whose first byte lands mid-character (UTF-8 continuation)
        is attributed to the character it shares — the offset of the
        first character containing any of its bytes.

        Raises if the concatenated bytes are not valid UTF-8.
        """
        token_bytes = self.decode_tokens_bytes(tokens)

        text_len = 0
        offsets = []
        for token in token_bytes:
            offsets.append(max(0, text_len - (0x80 <= token[0] < 0xC0)))
            text_len += sum(1 for c in token if not 0x80 <= c < 0xC0)

        text = b"".join(token_bytes).decode("utf-8", errors="strict")
        return text, offsets

    def decode_batch(
        self, batch: Sequence[Sequence[int]], *, errors: str = "replace", num_threads: int = 8
    ) -> list[str]:
        """``decode`` across a list of token sequences with a thread pool."""
        decoder = functools.partial(self.decode, errors=errors)
        with ThreadPoolExecutor(num_threads) as e:
            return list(e.map(decoder, batch))

    def decode_bytes_batch(
        self, batch: Sequence[Sequence[int]], *, num_threads: int = 8
    ) -> list[bytes]:
        """``decode_bytes`` across a list of token sequences with a thread pool."""
        with ThreadPoolExecutor(num_threads) as e:
            return list(e.map(self.decode_bytes, batch))

    # ====================
    # Miscellaneous
    # ====================

    def token_byte_values(self) -> list[bytes]:
        """All mergeable-token byte values in lexicographic order."""
        return self._core_bpe.token_byte_values()

    @property
    def eot_token(self) -> int:
        return self._special_tokens["<|endoftext|>"]

    @functools.cached_property
    def special_tokens_set(self) -> set[str]:
        return set(self._special_tokens.keys())

    def is_special_token(self, token: int) -> bool:
        assert isinstance(token, int)
        return token in self._special_token_values

    @property
    def n_vocab(self) -> int:
        """For backwards compatibility. Prefer ``enc.max_token_value + 1``."""
        return self.max_token_value + 1

    # ====================
    # Private
    # ====================

    def _encode_single_piece(self, text_or_bytes: str | bytes) -> list[int]:
        """BPE one piece directly — no regex split, no special tokens."""
        if isinstance(text_or_bytes, str):
            text_or_bytes = text_or_bytes.encode("utf-8")
        return self._core_bpe.encode_single_piece(text_or_bytes)

    def _encode_only_native_bpe(self, text: str) -> list[int]:
        """Encodes a string into tokens, but does the regex split separately
        from the per-piece BPE (mirrors the reference's debugging hook)."""
        import regex

        from tiktoken_tpu._pybpe import rust_compat_pattern

        pat = regex.compile(rust_compat_pattern(self._pat_str))
        ret = []
        for piece in regex.findall(pat, text):
            ret.extend(self._core_bpe.encode_single_piece(piece.encode("utf-8")))
        return ret

    def _encode_bytes(self, text: bytes) -> list[int]:
        return self._core_bpe.encode_bytes(text)

    def __getstate__(self) -> object:
        import tiktoken_tpu.registry

        # Registered encodings pickle as just their name (cheap, and
        # unpickling reuses the registry singleton).
        if self is tiktoken_tpu.registry.ENCODINGS.get(self.name):
            return self.name
        return {
            "name": self.name,
            "pat_str": self._pat_str,
            "mergeable_ranks": self._mergeable_ranks,
            "special_tokens": self._special_tokens,
        }

    def __setstate__(self, value: object) -> None:
        import tiktoken_tpu.registry

        if isinstance(value, str):
            self.__dict__ = tiktoken_tpu.registry.get_encoding(value).__dict__
            return
        self.__init__(**value)


@functools.lru_cache(maxsize=128)
def _special_token_regex(tokens: frozenset[str]) -> re.Pattern[str]:
    try:
        import regex as re
    except ImportError:
        import re
    inner = "|".join(re.escape(token) for token in tokens)
    return re.compile(f"({inner})")


def raise_disallowed_special_token(token: str) -> NoReturn:
    raise ValueError(
        f"Encountered text corresponding to disallowed special token {token!r}.\n"
        "If you want this text to be encoded as a special token, "
        f"pass it to `allowed_special`, e.g. `allowed_special={{{token!r}, ...}}`.\n"
        f"If you want this text to be encoded as normal text, disable the check for this token "
        f"by passing `disallowed_special=(enc.special_tokens_set - {{{token!r}}})`.\n"
        "To disable this check for all special tokens, pass `disallowed_special=()`.\n"
    )
