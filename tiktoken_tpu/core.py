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
        """Creates an Encoding object.

        See tiktoken_tpu_ext/openai_public.py for examples of how to
        construct an Encoding object.

        Args:
            name: The name of the encoding. It should be clear from the name
                what behaviour to expect; encodings with different special
                tokens should have different names.
            pat_str: A regex pattern string used to split the input text.
            mergeable_ranks: A dictionary mapping mergeable token bytes to
                their ranks. The ranks must correspond to merge priority.
            special_tokens: A dictionary mapping special token strings to
                their token values.
            explicit_n_vocab: The number of tokens in the vocabulary. If
                provided, it is checked that the number of mergeable tokens
                and special tokens is equal to this number.
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

            self._device_engine = DeviceEngine.build(
                self._pat_str, self._mergeable_ranks, name=self.name
            )
        return self._device_engine


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
        """Encodes a string into tokens, ignoring special tokens.

        This is equivalent to ``encode(text, disallowed_special=())``
        (but slightly faster).
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
        """Encodes a string into tokens.

        Special tokens are artificial tokens used to unlock capabilities
        from a model, so by default encode raises an error if the text
        contains one. Control this per token with ``allowed_special`` and
        ``disallowed_special``:
        - ``disallowed_special=()`` never raises and encodes the text of
          special tokens as natural text.
        - ``allowed_special="all"`` encodes all special-token text as
          special tokens.
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
        """Encodes a list of strings into tokens, in parallel, ignoring
        special tokens.

        Equivalent to ``encode_batch(text, disallowed_special=())``. With
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
        """Encodes a list of strings into tokens, in parallel.

        See ``encode`` for more details on ``allowed_special`` and
        ``disallowed_special``.
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

    def _device_encode(self, texts, row_capacity=None):
        """Route to the newest device pipeline: v3 (handshake rows,
        ops/pipeline3) when char-level tables are enabled, else v2.
        TIKTOKEN_TPU_PIPELINE=2 forces v2."""
        import os

        eng = self.device_engine
        if (
            eng.char_tables is not None
            and os.environ.get("TIKTOKEN_TPU_PIPELINE", "3") != "2"
        ):
            return eng.encode_corpus3(
                texts, host_fallback=self._core_bpe, K=row_capacity
            )
        kwargs = {} if row_capacity is None else {"row_capacity": row_capacity}
        return eng.encode_corpus(texts, host_fallback=self._core_bpe, **kwargs)

    def encode_corpus(
        self,
        texts: Sequence[str] | Sequence[bytes],
        *,
        device: bool = True,
        row_capacity: int | None = None,
        strategy: str = "auto",
    ) -> list[list[int]]:
        """Encodes a large batch of documents at maximum node throughput.

        ``strategy``:
          - "auto" (default): pick per node. Single-core hosts with the
            native core run host-only (a device worker's Python
            orchestration would steal more GIL time from the host engine
            than the device contributes); multi-core hosts run hybrid;
            hosts without a compiler run the device pipeline.
          - "hybrid": device pipeline and the native host core pull
            documents from a shared queue concurrently — the host worker's
            ctypes call releases the GIL, so CPU and TPU overlap and the
            split self-balances to each engine's actual speed.
          - "device": everything through the TPU pipeline.
          - "host": everything through the host engine.

        All strategies are byte-exact with ``encode_ordinary``.
        """
        native = self._core_bpe._native_core()
        if strategy == "auto":
            import os as _os

            if not native:
                strategy = "device"
            elif (_os.cpu_count() or 1) <= 1:
                strategy = "host"
            else:
                strategy = "hybrid"
        if not device or strategy == "host":
            return [self.encode_ordinary(t if isinstance(t, str) else t.decode("utf-8"))
                    for t in texts]
        kwargs = {} if row_capacity is None else {"row_capacity": row_capacity}
        if strategy == "device" or not native:
            return self._device_encode(texts, row_capacity)

        # hybrid: shared work queue, one device worker + one host worker
        import queue
        import threading

        texts = list(texts)
        out: list = [None] * len(texts)
        q: queue.Queue = queue.Queue()
        for i, t in enumerate(texts):
            q.put(i)
        def host_worker():
            while True:
                try:
                    i = q.get_nowait()
                except queue.Empty:
                    return
                t = texts[i]
                out[i] = self.encode_ordinary(
                    t if isinstance(t, str) else t.decode("utf-8")
                )

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
                    got = self._device_encode([texts[i] for i in idxs], row_capacity)
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
                out[i] = self.encode_ordinary(
                    t if isinstance(t, str) else t.decode("utf-8")
                )
        return out

    def encode_with_unstable(
        self,
        text: str,
        *,
        allowed_special: Literal["all"] | AbstractSet[str] = set(),  # noqa: B006
        disallowed_special: Literal["all"] | Collection[str] = "all",
    ) -> tuple[list[int], list[list[int]]]:
        """Encodes a string into stable tokens and possible completion
        sequences.

        The stable tokens represent only a prefix of ``text``; the
        completions enumerate token sequences that could complete the
        unstable tail. This API should itself be considered unstable.
        """
        allowed_special, _ = self._resolve_specials(text, allowed_special, disallowed_special)

        tokens, completions = self._core_bpe.encode_with_unstable(text, allowed_special)
        return tokens, [list(c) for c in completions]

    def encode_single_token(self, text_or_bytes: str | bytes) -> int:
        """Encodes text corresponding to a single token to its token value.

        NOTE: this will encode all special tokens.
        Raises ``KeyError`` if the token is not in the vocabulary.
        """
        if isinstance(text_or_bytes, str):
            text_or_bytes = text_or_bytes.encode("utf-8")
        return self._core_bpe.encode_single_token(text_or_bytes)

    # ====================
    # Decoding
    # ====================

    def decode_bytes(self, tokens: Sequence[int]) -> bytes:
        """Decodes a list of tokens into bytes."""
        return self._core_bpe.decode_bytes(tokens)

    def decode(self, tokens: Sequence[int], errors: str = "replace") -> str:
        """Decodes a list of tokens into a string.

        WARNING: the default behaviour of this function is lossy, since
        decoded bytes are not guaranteed to be valid UTF-8. Control this
        with the ``errors`` parameter, e.g. ``errors="strict"``.
        """
        return self._core_bpe.decode_bytes(tokens).decode("utf-8", errors=errors)

    def decode_single_token_bytes(self, token: int) -> bytes:
        """Decodes a token into bytes.

        NOTE: this will decode all special tokens.
        Raises ``KeyError`` if the token is not in the vocabulary.
        """
        return self._core_bpe.decode_single_token_bytes(token)

    def decode_tokens_bytes(self, tokens: Sequence[int]) -> list[bytes]:
        """Decodes a list of tokens into a list of bytes."""
        return [self.decode_single_token_bytes(token) for token in tokens]

    def decode_with_offsets(self, tokens: Sequence[int]) -> tuple[str, list[int]]:
        """Decodes a list of tokens into a string and a list of offsets.

        Each offset is the index into text corresponding to the start of
        each token. If UTF-8 character boundaries do not line up with token
        boundaries, the offset is the index of the first character that
        contains bytes from the token.

        This currently raises if given tokens that decode to invalid UTF-8.
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
        """Decodes a batch (list of lists of tokens) into a list of strings."""
        decoder = functools.partial(self.decode, errors=errors)
        with ThreadPoolExecutor(num_threads) as e:
            return list(e.map(decoder, batch))

    def decode_bytes_batch(
        self, batch: Sequence[Sequence[int]], *, num_threads: int = 8
    ) -> list[bytes]:
        """Decodes a batch (list of lists of tokens) into a list of bytes."""
        with ThreadPoolExecutor(num_threads) as e:
            return list(e.map(self.decode_bytes, batch))

    # ====================
    # Miscellaneous
    # ====================

    def token_byte_values(self) -> list[bytes]:
        """Returns the list of all token byte values, sorted."""
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
        """Encodes text corresponding to bytes without a regex split.

        NOTE: this will not encode any special tokens.
        """
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

        # As an optimisation, pickle registered encodings by reference.
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
