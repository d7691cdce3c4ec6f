"""Generate Unicode category overrides matching the reference engine.

Problem: byte-exact split parity requires the exact Unicode version of the
reference's regex engine (Rust regex crate, Unicode 16.0 at reference
v0.13), but CPython's unicodedata is 15.0 and the Python regex module is
17.x. Categories of codepoints added/changed between versions would
diverge.

Solution: treat the installed reference library itself as a category
oracle. Construct a reference Encoding whose pat_str is a single \\p{X}
class over a byte-level vocab: encode_ordinary(ch) returns [] iff ch does
not match (find_iter skips unmatched text). Candidate codepoints are the
ones where unicodedata 15.0 and the regex module (17.x) disagree; probing
only those keeps this fast. The result is written to
tiktoken_tpu/ops/_unicode_overrides.py as add/remove interval lists per
category, applied on top of unicodedata by unicode_tables.category_set.

Usage: python scripts/gen_unicode_overrides.py
"""

from __future__ import annotations

import sys
import unicodedata
from collections import defaultdict

sys.path.insert(0, ".")

import regex

import tiktoken

SUBCATS = ["Lu", "Ll", "Lt", "Lm", "Lo", "Mn", "Mc", "Me", "Nd", "Nl", "No"]
MAX_CP = 0x10FFFF

BYTE_RANKS = {bytes([i]): i for i in range(256)}


def rust_matches(subcat: str, chars: list[str], pat: str | None = None) -> set[str]:
    """Which of ``chars`` match \\p{subcat} under the reference engine."""
    enc = tiktoken.Encoding(
        f"probe_{subcat}",
        pat_str=pat if pat is not None else rf"\p{{{subcat}}}",
        mergeable_ranks=BYTE_RANKS,
        special_tokens={},
    )
    matched: set[str] = set()
    # NUL separators never match any of these categories; the output is the
    # concatenation of the matched characters' UTF-8 bytes.
    chunk = 4096
    for i in range(0, len(chars), chunk):
        part = chars[i : i + chunk]
        toks = enc.encode_ordinary("\x00".join(part))
        out = bytes(toks).decode("utf-8") if toks else ""
        matched.update(out)
    return matched


def to_ranges(cps: list[int]) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for cp in sorted(cps):
        if out and cp == out[-1][1] + 1:
            out[-1] = (out[-1][0], cp)
        else:
            out.append((cp, cp))
    return out


def main() -> None:
    # Categories per codepoint under both local data sources.
    cat15 = {}
    all_chars = []
    for cp in range(MAX_CP + 1):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        ch = chr(cp)
        cat15[cp] = unicodedata.category(ch)
        all_chars.append(ch)

    plane_text = "".join(all_chars)
    cat17_sets: dict[str, set[str]] = {}
    for sc in SUBCATS:
        cat17_sets[sc] = set(regex.findall(rf"\p{{{sc}}}", plane_text))
        print(f"regex-module {sc}: {len(cat17_sets[sc])} cps", file=sys.stderr)

    # Probe the reference engine over the WHOLE plane for every category
    # (one pass per category in 4096-char chunks is ~260 oracle calls).
    # ADD/REMOVE correct unicodedata for the DFA tables; SKEW marks every
    # codepoint where the Python regex module (the pure-Python fast-path
    # arbiter) disagrees with the reference engine, so texts containing
    # one defer to the compiled scanner DFA. Probing only
    # unicodedata-vs-regex candidates (the old scheme) missed codepoints
    # where BOTH local sources agree with each other but not with the
    # reference.
    add: dict[str, list[int]] = defaultdict(list)
    remove: dict[str, list[int]] = defaultdict(list)
    skew: set[int] = set()
    for sc in SUBCATS:
        truth = rust_matches(sc, all_chars)
        for ch in all_chars:
            cp = ord(ch)
            in15 = cat15[cp] == sc
            in17 = ch in cat17_sets[sc]
            in_truth = ch in truth
            if in_truth and not in15:
                add[sc].append(cp)
            elif in15 and not in_truth:
                remove[sc].append(cp)
            if in17 != in_truth:
                skew.add(cp)
        print(
            f"{sc}: +{len(add[sc])} -{len(remove[sc])} vs unicodedata, "
            f"skew {len(skew)} cumulative",
            file=sys.stderr,
        )

    # \w under the reference engine: the Rust regex crate defines \w via
    # UTS#18 word characters (Alphabetic + Mark + Decimal_Number +
    # Connector_Punctuation + Join_Control), which no local data source
    # reproduces exactly. The regex module's own \w feeds SKEW so custom
    # \w patterns on the pure-Python fast path stay byte-exact: any text
    # where the two engines could split differently defers to the DFA.
    word_truth = rust_matches("word_probe", all_chars, pat=r"\w")
    word_cps = sorted(ord(c) for c in word_truth)
    print(f"\\w: {len(word_cps)} cps under the reference engine", file=sys.stderr)
    regex_word = set(regex.findall(r"\w", plane_text))
    skew.update(ord(c) for c in regex_word.symmetric_difference(word_truth))
    all_candidates = skew

    with open("tiktoken_tpu/ops/_unicode_overrides.py", "w") as f:
        f.write(
            '"""Auto-generated by scripts/gen_unicode_overrides.py — do not edit.\n\n'
            "Category deltas between CPython's unicodedata "
            f"(Unicode {unicodedata.unidata_version}) and the reference engine's\n"
            "Unicode data, probed directly against the installed reference library.\n"
            'Applied by tiktoken_tpu.ops.unicode_tables.category_set."""\n\n'
        )
        f.write("ADD = {\n")
        for sc in SUBCATS:
            if add[sc]:
                f.write(f"    {sc!r}: {to_ranges(add[sc])!r},\n")
        f.write("}\n\nREMOVE = {\n")
        for sc in SUBCATS:
            if remove[sc]:
                f.write(f"    {sc!r}: {to_ranges(remove[sc])!r},\n")
        f.write("}\n\n")
        f.write(
            "# Codepoints where the Python regex module disagrees with the\n"
            "# reference engine (categories or \\w); the regex module cannot\n"
            "# arbitrate splits on these — texts containing one defer to the\n"
            "# compiled scanner DFA.\n"
        )
        f.write(f"SKEW = {to_ranges(sorted(all_candidates))!r}\n\n")
        f.write(
            "# Exact \\w of the reference engine (UTS#18 word characters),\n"
            "# probed over the whole plane; used by unicode_tables.word_set.\n"
        )
        f.write(f"WORD = {to_ranges(word_cps)!r}\n")
    print("wrote tiktoken_tpu/ops/_unicode_overrides.py", file=sys.stderr)


if __name__ == "__main__":
    main()
