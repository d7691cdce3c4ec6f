"""Host-side exact BPE engine.

This module is the CPU "oracle" implementation of the tokenizer semantics:
a from-scratch, pure-Python reimplementation of the behaviour of the
reference native core (reference: src/lib.rs:318-676, src/py.rs:13-183).
It exists for three reasons:

1. It is the semantic ground truth the TPU kernels are differentially
   tested against (together with the reference library itself when it is
   installed).
2. It is the latency path: single short strings are cheaper to tokenize on
   the host than to ship to the device.
3. It implements the long-tail APIs that are latency- rather than
   throughput-bound and therefore deliberately stay on the host
   (``encode_with_unstable``, single-token queries, invalid-UTF-8 input).

Exact semantics reproduced (each noted with the reference behaviour it
matches; see SURVEY.md section 2.3 for the full matrix):

- greedy BPE: repeatedly merge the lowest-rank adjacent pair, ties broken
  by leftmost position; pair rank is looked up by the *concatenated bytes*
  (reference: src/lib.rs:140-196).
- whole-piece vocabulary hits short-circuit BPE (reference: src/lib.rs:367).
- special tokens are matched before ordinary tokenization; a special token
  found but not allowed restarts the special scan one character later
  (reference: src/lib.rs:387-401).
- ``encode`` returns ``(tokens, last_piece_token_len)`` where the latter
  counts tokens of the final regex piece (reference: src/lib.rs:439-441).
- unstable-token enumeration for completion APIs
  (reference: src/lib.rs:444-599).
- arbitrary-bytes encoding (reference: src/py.rs:72-115).
"""

from __future__ import annotations

import bisect
import heapq
from typing import Iterable, Sequence

RANK_MAX = 0xFFFFFFFF

# Codepoints with the Unicode White_Space property. The reference's regex
# engine defines ``\s`` as exactly this set, which differs from Python's
# ``str.isspace()`` (e.g. U+001C..U+001F are isspace() but not White_Space).
WHITE_SPACE = (
    "\t\n\x0b\x0c\r \x85\xa0 "
    "           "
    "    　"
)
_WHITE_SPACE_SET = frozenset(WHITE_SPACE)


def rust_compat_pattern(pat_str: str) -> str:
    """Rewrite a pat_str so Python's ``regex`` module matches the reference
    engine's semantics.

    Differences papered over:
    - ``\\s`` / ``\\S``: the reference engine uses the Unicode White_Space
      property; Python's regex module uses a slightly larger set.
    - ``$``: the reference engine (no multi-line flag) anchors at the very
      end of the haystack; Python's ``$`` also matches before a final
      newline, so use ``\\Z``.

    The token classes ``\\p{L}`` etc. agree between the two engines up to
    Unicode version skew.
    """
    ws = "\\t\\n\\x0b\\x0c\\r \\x85\\xa0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000"
    out: list[str] = []
    in_class = False
    i = 0
    while i < len(pat_str):
        ch = pat_str[i]
        if ch == "\\" and i + 1 < len(pat_str):
            nxt = pat_str[i + 1]
            if nxt == "s":
                # Bare characters inside a class, a bracketed class outside.
                out.append(ws if in_class else f"[{ws}]")
            elif nxt == "S":
                if in_class:
                    raise NotImplementedError(r"\S inside a character class")
                out.append(f"[^{ws}]")
            else:
                out.append(ch + nxt)
            i += 2
            continue
        if not in_class and ch == "[":
            in_class = True
        elif in_class and ch == "]":
            in_class = False
        elif not in_class and ch == "$":
            out.append(r"\Z")
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _compile_pattern(pat_str: str):
    import regex

    return regex.compile(rust_compat_pattern(pat_str))


# ---------------------------------------------------------------------------
# Greedy byte-pair merging
# ---------------------------------------------------------------------------


def byte_pair_merge_boundaries(ranks: dict[bytes, int], piece: bytes) -> list[int]:
    """Run greedy BPE on ``piece`` and return the sorted token boundaries.

    The result includes 0 and len(piece). Semantics: repeatedly merge the
    adjacent pair whose concatenated bytes have the lowest rank; ties are
    broken by the leftmost position (reference: src/lib.rs:140-196).
    """
    n = len(piece)
    if n < 2:
        return list(range(n + 1))
    if n >= 512:
        return _byte_pair_merge_heap(ranks, piece)

    # parts[i] is a byte offset; pair_rank[i] is the rank of merging the
    # token starting at parts[i] with the token starting at parts[i+1].
    parts = list(range(n + 1))
    get = ranks.get
    pair_rank = [get(piece[i : i + 2], RANK_MAX) for i in range(n - 1)]
    pair_rank.append(RANK_MAX)  # boundary before final token
    pair_rank.append(RANK_MAX)  # sentinel at end-of-piece

    while True:
        min_rank = RANK_MAX
        min_i = -1
        for i, r in enumerate(pair_rank):
            if r < min_rank:
                min_rank = r
                min_i = i
        if min_i < 0 or min_rank == RANK_MAX:
            break
        i = min_i
        # Merge tokens i and i+1: recompute the ranks of the pair to the
        # left and of the newly-formed pair, then drop boundary i+1.
        if i > 0:
            if i + 2 < len(parts):
                pair_rank[i - 1] = get(piece[parts[i - 1] : parts[i + 2]], RANK_MAX)
            else:
                pair_rank[i - 1] = RANK_MAX
        if i + 3 < len(parts):
            pair_rank[i] = get(piece[parts[i] : parts[i + 3]], RANK_MAX)
        else:
            pair_rank[i] = RANK_MAX
        del parts[i + 1]
        del pair_rank[i + 1]

    return parts


def _byte_pair_merge_heap(ranks: dict[bytes, int], piece: bytes) -> list[int]:
    """Heap-based O(m log n) variant for long pieces.

    Same fixed point as :func:`byte_pair_merge_boundaries`; the heap pops
    (rank, start) so the lowest rank, leftmost-start pair merges first, with
    lazy invalidation of stale entries (reference: src/lib.rs:17-138).
    """
    n = len(piece)
    get = ranks.get
    # Doubly linked list over byte offsets.
    nxt = list(range(1, n + 1)) + [n + 1]
    prv = list(range(-1, n))
    cur_rank = [RANK_MAX] * (n + 1)  # rank of the pair starting at offset i
    heap: list[tuple[int, int]] = []
    for i in range(n - 1):
        r = get(piece[i : i + 2], RANK_MAX)
        if r != RANK_MAX:
            cur_rank[i] = r
            heap.append((r, i))
    heapq.heapify(heap)
    alive = [True] * (n + 1)

    while heap:
        r, i = heapq.heappop(heap)
        if not alive[i] or cur_rank[i] != r:
            continue  # stale entry
        j = nxt[i]  # start of the right token
        k = nxt[j]  # end of the right token
        # Merge tokens [i, j) and [j, k).
        alive[j] = False
        cur_rank[j] = RANK_MAX
        nxt[i] = k
        if k <= n:
            prv[k] = i
        # New pair starting at i (merged token + following token).
        if k < n:
            e = nxt[k]
            nr = get(piece[i:e], RANK_MAX)
        else:
            nr = RANK_MAX
        cur_rank[i] = nr
        if nr != RANK_MAX:
            heapq.heappush(heap, (nr, i))
        # Updated pair ending at i (previous token + merged token).
        if i > 0:
            p = prv[i]
            pr = get(piece[p:k], RANK_MAX)
            cur_rank[p] = pr
            if pr != RANK_MAX:
                heapq.heappush(heap, (pr, p))

    parts = []
    i = 0
    while i <= n:
        parts.append(i)
        if i == n:
            break
        i = nxt[i]
    return parts


def byte_pair_encode(piece: bytes, ranks: dict[bytes, int]) -> list[int]:
    """BPE-encode a piece that is not itself a vocabulary token."""
    if len(piece) == 1:
        return [ranks[piece]]
    parts = byte_pair_merge_boundaries(ranks, piece)
    return [ranks[piece[parts[i] : parts[i + 1]]] for i in range(len(parts) - 1)]


def byte_pair_split(piece: bytes, ranks: dict[bytes, int]) -> list[bytes]:
    """Return the byte segments greedy BPE splits ``piece`` into."""
    assert len(piece) > 1
    parts = byte_pair_merge_boundaries(ranks, piece)
    return [piece[parts[i] : parts[i + 1]] for i in range(len(parts) - 1)]


def _decode_last_utf8(data: bytes) -> tuple[str | None, int]:
    """Decode the last UTF-8 character of ``data``.

    Returns (char, nbytes) where nbytes is how many trailing bytes the
    character occupies, or (None, k) when the trailing bytes are not valid
    UTF-8 (k = length of the trailing invalid sequence, capped at 3).
    """
    if not data:
        return None, 0
    for j in range(1, min(4, len(data)) + 1):
        tail = data[-j:]
        if 0x80 <= tail[0] < 0xC0:
            continue  # continuation byte; keep scanning left for the start
        try:
            ch = tail.decode("utf-8")
        except UnicodeDecodeError:
            return None, j
        return (ch, j) if len(ch) == 1 else (None, j)
    return None, min(3, len(data))


class HostBPE:
    """Exact host engine: the Python equivalent of the reference native core.

    Construction validates the same invariants (no duplicate ranks) and
    builds the same lookup structures: encoder/decoder maps, special-token
    maps, and the sorted token list used for unstable-token search
    (reference: src/lib.rs:601-663).
    """

    def __init__(
        self,
        encoder: dict[bytes, int],
        special_tokens_encoder: dict[str, int],
        pattern: str,
    ):
        self.encoder = dict(encoder)
        self.special_tokens_encoder = dict(special_tokens_encoder)
        self.pattern = pattern
        self.regex = _compile_pattern(pattern)

        import re as _re

        if special_tokens_encoder:
            self.special_regex = _re.compile(
                "|".join(_re.escape(k) for k in special_tokens_encoder)
            )
        else:
            self.special_regex = None

        self.decoder: dict[int, bytes] = {v: k for k, v in self.encoder.items()}
        if len(self.encoder) != len(self.decoder):
            raise ValueError(
                "Encoder and decoder must be of equal length; "
                "maybe you had duplicate token indices in your encoder?"
            )
        self.special_tokens_decoder: dict[int, bytes] = {
            v: k.encode("utf-8") for k, v in special_tokens_encoder.items()
        }
        self.sorted_token_bytes: list[bytes] = sorted(self.encoder.keys())

    # -- encoding ----------------------------------------------------------

    def encode_ordinary(self, text: str) -> list[int]:
        """Split with the pattern, then whole-piece hit or BPE per piece
        (reference: src/lib.rs:360-373)."""
        ret: list[int] = []
        enc = self.encoder
        for mat in self.regex.finditer(text):
            piece = mat.group().encode("utf-8")
            token = enc.get(piece)
            if token is not None:
                ret.append(token)
            else:
                ret.extend(byte_pair_encode(piece, enc))
        return ret

    def encode(self, text: str, allowed_special: frozenset[str] | set[str]) -> tuple[list[int], int]:
        """Encode honouring allowed special tokens.

        Returns (tokens, last_piece_token_len); the latter feeds the
        unstable-token machinery (reference: src/lib.rs:375-442).
        """
        ret: list[int] = []
        enc = self.encoder
        start = 0
        last_piece_token_len = 0
        text_len = len(text)
        while True:
            next_special = None
            if self.special_regex is not None:
                start_find = start
                while True:
                    m = self.special_regex.search(text, start_find)
                    if m is None:
                        break
                    if m.group() in allowed_special:
                        next_special = m
                        break
                    # A disallowed special present in the text restarts the
                    # scan one character later (reference: src/lib.rs:397).
                    start_find = m.start() + 1
            end = next_special.start() if next_special is not None else text_len

            for mat in self.regex.finditer(text, start, end):
                piece = mat.group().encode("utf-8")
                token = enc.get(piece)
                if token is not None:
                    last_piece_token_len = 1
                    ret.append(token)
                    continue
                tokens = byte_pair_encode(piece, enc)
                last_piece_token_len = len(tokens)
                ret.extend(tokens)

            if next_special is None:
                break
            ret.append(self.special_tokens_encoder[next_special.group()])
            start = next_special.end()
            last_piece_token_len = 0

        return ret, last_piece_token_len

    def encode_with_special_tokens(self, text: str) -> list[int]:
        return self.encode(text, set(self.special_tokens_encoder))[0]

    def encode_single_token(self, piece: bytes) -> int:
        """(reference: src/py.rs:133-143)"""
        token = self.encoder.get(piece)
        if token is not None:
            return token
        try:
            piece_str = piece.decode("utf-8")
        except UnicodeDecodeError:
            pass
        else:
            token = self.special_tokens_encoder.get(piece_str)
            if token is not None:
                return token
        raise KeyError(piece)

    def encode_single_piece(self, piece: bytes) -> list[int]:
        """(reference: src/py.rs:145-150)"""
        token = self.encoder.get(piece)
        if token is not None:
            return [token]
        return byte_pair_encode(piece, self.encoder)

    def encode_bytes(self, data: bytes) -> list[int]:
        """Encode arbitrary (possibly invalid-UTF-8) bytes
        (reference: src/py.rs:72-115)."""
        try:
            text = data.decode("utf-8")
        except UnicodeDecodeError as e:
            valid_up_to = e.start
        else:
            return self.encode_ordinary(text)

        # Longest valid prefix decoded per the error offset above; the
        # remainder is raw bytes re-attached to the unstable tail.
        text = data[:valid_up_to].decode("utf-8")
        tokens, last_piece_token_len = self.encode(text, frozenset())
        tokens, last_piece_token_len = self._increase_last_piece_token_len(
            tokens, last_piece_token_len
        )
        if tokens and last_piece_token_len > 0:
            unstable_bytes = self.decode_bytes(tokens[len(tokens) - last_piece_token_len :])
            unstable_bytes += data[valid_up_to:]
            del tokens[len(tokens) - last_piece_token_len :]
        else:
            unstable_bytes = data[valid_up_to:]

        if unstable_bytes:
            token = self.encoder.get(unstable_bytes)
            if token is not None:
                tokens.append(token)
            else:
                tokens.extend(byte_pair_encode(unstable_bytes, self.encoder))
        return tokens

    # -- unstable tokens ----------------------------------------------------

    def _increase_last_piece_token_len(
        self, tokens: list[int], last_piece_token_len: int
    ) -> tuple[list[int], int]:
        """Widen the unstable tail over whitespace runs: regex splits inside
        whitespace (cl100k's ``\\s*[\\r\\n]``) are themselves unstable
        (reference: src/lib.rs:444-481)."""

        def token_is_all_space(token: int) -> bool:
            token_bytes = self.decoder.get(token)
            if token_bytes is None:
                return False
            return all(b in (0x20, 0x0A, 0x09) for b in token_bytes)

        if last_piece_token_len > 0 and token_is_all_space(
            tokens[len(tokens) - last_piece_token_len]
        ):
            while last_piece_token_len < len(tokens) and token_is_all_space(
                tokens[len(tokens) - last_piece_token_len - 1]
            ):
                last_piece_token_len += 1
        assert last_piece_token_len <= len(tokens)
        return tokens, last_piece_token_len

    def encode_with_unstable(
        self, text: str, allowed_special: frozenset[str] | set[str]
    ) -> tuple[list[int], set[tuple[int, ...]]]:
        """Stable prefix tokens plus all completion token sequences for the
        unstable tail (reference: src/lib.rs:483-599)."""
        tokens, last_piece_token_len = self.encode(text, allowed_special)
        if last_piece_token_len == 0:
            # Ends with a special token: nothing is unstable.
            return tokens, set()
        tokens, last_piece_token_len = self._increase_last_piece_token_len(
            tokens, last_piece_token_len
        )
        unstable_bytes = self.decode_bytes(tokens[len(tokens) - last_piece_token_len :])
        del tokens[len(tokens) - last_piece_token_len :]

        completions: set[tuple[int, ...]] = set()
        if not unstable_bytes:
            return tokens, completions

        sorted_tokens = self.sorted_token_bytes
        # Single tokens having unstable_bytes as a prefix.
        point = bisect.bisect_left(sorted_tokens, unstable_bytes)
        while point < len(sorted_tokens) and sorted_tokens[point].startswith(unstable_bytes):
            completions.add((self.encoder[sorted_tokens[point]],))
            point += 1

        # Brute force: at every split of unstable_bytes, extend the suffix
        # with each token that starts with it and retokenise.
        for i in range(1, len(unstable_bytes)):
            prefix = unstable_bytes[:i]
            suffix = unstable_bytes[i:]
            point = bisect.bisect_left(sorted_tokens, suffix)
            while point < len(sorted_tokens) and sorted_tokens[point].startswith(suffix):
                possibility = prefix + sorted_tokens[point]
                try:
                    possibility_str = possibility.decode("utf-8")
                except UnicodeDecodeError:
                    encoded = byte_pair_encode(possibility, self.encoder)
                else:
                    # Retokenise via the regex: extending bytes may have
                    # introduced a split that blocks merges.
                    encoded = self.encode_ordinary(possibility_str)
                seq: list[int] = []
                seq_len = 0
                for token in encoded:
                    seq.append(token)
                    seq_len += len(self.decoder[token])
                    if seq_len >= len(unstable_bytes):
                        break
                completions.add(tuple(seq))
                point += 1

        # Whitespace-split fix for patterns like gpt2's \s+(?!\S): adding
        # bytes can create a split inside trailing whitespace
        # (reference: src/lib.rs:581-596).
        if len(unstable_bytes) > 1:
            last_char, nbytes = _decode_last_utf8(unstable_bytes)
            if (
                len(unstable_bytes) - nbytes > 0
                and last_char is not None
                and last_char in _WHITE_SPACE_SET
            ):
                reencoded = byte_pair_encode(
                    unstable_bytes[: len(unstable_bytes) - nbytes], self.encoder
                )
                reencoded.extend(
                    byte_pair_encode(unstable_bytes[len(unstable_bytes) - nbytes :], self.encoder)
                )
                completions.add(tuple(reencoded))

        return tokens, completions

    # -- decoding ------------------------------------------------------------

    def decode_bytes(self, tokens: Iterable[int]) -> bytes:
        """(reference: src/lib.rs:342-358)"""
        out = bytearray()
        for token in tokens:
            token_bytes = self.decoder.get(token)
            if token_bytes is None:
                token_bytes = self.special_tokens_decoder.get(token)
                if token_bytes is None:
                    raise KeyError(f"Invalid token for decoding: {token}")
            out += token_bytes
        return bytes(out)

    def decode_single_token_bytes(self, token: int) -> bytes:
        token_bytes = self.decoder.get(token)
        if token_bytes is not None:
            return token_bytes
        token_bytes = self.special_tokens_decoder.get(token)
        if token_bytes is not None:
            return token_bytes
        raise KeyError(str(token))

    # -- misc ----------------------------------------------------------------

    def token_byte_values(self) -> list[bytes]:
        return list(self.sorted_token_bytes)
