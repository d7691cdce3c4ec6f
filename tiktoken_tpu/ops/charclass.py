"""Per-byte char-class grid: the front half of the char-level scanner.

The byte-level scanner DFA (ops/regex_compiler.ScannerDFA) needs ~2000
states because Unicode classes expand into UTF-8 byte sequences; its
transition table is gather-only territory (HARDWARE.md: ~125M random
lookups/s). The char-level DFA (CharScannerDFA) is tiny (<= 21 states x
23 classes for o200k) but steps over *characters*.

This module bridges the two scales byte-side: a vectorized pass that
labels every byte position with

- the char class of the character *ending* at that position (so the DFA
  transition fires exactly once per character, at its last byte),
- SKIP for bytes inside a multi-byte character (the scanner holds state),
- the EOF class at and beyond end-of-text.

Character classes come from the CharScannerDFA's codepoint partition
(edges/seg_class) compiled into a two-level page table:

    page = cp >> 7                                  (8704 pages)
    page uniform  -> class directly
    page mixed    -> row index into mixed_rows [n_mixed, 128]

Only ~230 of the 8704 pages are mixed for the shipped patterns, so both
levels fit the MXU one-hot lookup regime (exact int8 matmuls) — the whole
class map runs without a single dynamic gather. Truncated trailing
characters (a row's lookahead can end mid-character) never fire a char
end: they read as SKIP until EOF, exactly like the byte DFA dying in its
UTF-8 decode states (reference semantics: the scan resolves at the last
accept; reference: src/lib.rs:363-365).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from tiktoken_tpu.ops.regex_compiler import CharScannerDFA

PAGE_BITS = 7
N_PAGES = 0x110000 >> PAGE_BITS  # 8704
MIXED_FLAG = 1 << 13  # page entry: MIXED_FLAG | mixed_idx, else class id


@dataclass
class CharClassTables:
    """Codepoint -> char-class, page-compressed for device lookup."""

    page_entry: np.ndarray  # [N_PAGES] int32: class | (MIXED_FLAG|mixed_idx)
    mixed_rows: np.ndarray  # [n_mixed, 128] uint8 class ids
    n_classes: int  # char classes; SKIP == n_classes, CONT == n_classes + 1
    eof_class: int
    n_states: int
    trans: np.ndarray  # [n_states, n_classes] from the CharScannerDFA
    accept: np.ndarray  # [n_states] int8 rewind-in-chars (-1 = no accept)

    @property
    def skip_class(self) -> int:
        """Non-final *lead* byte of a (possibly truncated) character: the
        scanner holds state. A match may legitimately start here."""
        return self.n_classes

    @property
    def cont_class(self) -> int:
        """UTF-8 continuation byte that is not a char end: the scanner
        holds state, but a match starting here is mid-character — the
        byte-level DFA dies immediately, and the scan kernel mirrors
        that."""
        return self.n_classes + 1


def build_char_class_tables(dfa: CharScannerDFA) -> CharClassTables:
    """Compile the DFA's codepoint partition into page tables."""
    edges = dfa.edges.astype(np.int64)  # ascending, edges[0]=0, last=0x110000
    seg_class = dfa.seg_class.astype(np.int64)

    # class of every codepoint, page by page (vectorized per segment run)
    page_entry = np.zeros(N_PAGES, dtype=np.int32)
    mixed_rows: list[np.ndarray] = []

    # page p covers [p<<7, (p+1)<<7); mixed iff an edge falls strictly inside
    inner = edges[1:-1]
    mixed_pages = np.unique(inner[(inner & ((1 << PAGE_BITS) - 1)) != 0] >> PAGE_BITS)
    mixed_set = set(int(p) for p in mixed_pages)

    # uniform pages: class of their first codepoint
    starts = np.arange(N_PAGES, dtype=np.int64) << PAGE_BITS
    seg_of_start = np.searchsorted(edges, starts, side="right") - 1
    page_entry[:] = seg_class[np.minimum(seg_of_start, len(seg_class) - 1)]

    for p in sorted(mixed_set):
        cps = (np.int64(p) << PAGE_BITS) + np.arange(1 << PAGE_BITS, dtype=np.int64)
        segs = np.searchsorted(edges, cps, side="right") - 1
        row = seg_class[np.minimum(segs, len(seg_class) - 1)].astype(np.uint8)
        page_entry[p] = MIXED_FLAG | len(mixed_rows)
        mixed_rows.append(row)

    rows = (
        np.stack(mixed_rows)
        if mixed_rows
        else np.zeros((1, 1 << PAGE_BITS), np.uint8)
    )
    assert int(dfa.accept.max()) <= 1, "char-level rewind must be <= 1 char"
    assert dfa.n_classes < MIXED_FLAG
    # the scan kernel keys its EOF end-rewind adjustment on eof_class: no
    # real codepoint may share it (holds because EOF is dead from START
    # while every codepoint starts some alternative)
    assert not np.any(dfa.seg_class == dfa.eof_class)
    return CharClassTables(
        page_entry=page_entry,
        mixed_rows=rows,
        n_classes=int(dfa.n_classes),
        eof_class=int(dfa.eof_class),
        n_states=int(dfa.n_states),
        trans=dfa.trans.astype(np.int32),
        accept=dfa.accept.astype(np.int8),
    )


def class_of_cp_tables(tables: CharClassTables, cp: int) -> int:
    """Host-side table lookup (spec cross-check vs dfa.class_of_cp)."""
    e = int(tables.page_entry[cp >> PAGE_BITS])
    if e & MIXED_FLAG:
        return int(tables.mixed_rows[e & (MIXED_FLAG - 1), cp & ((1 << PAGE_BITS) - 1)])
    return e


# ---------------------------------------------------------------------------
# numpy reference: per-byte class grid (the spec for the jax version)
# ---------------------------------------------------------------------------


def _utf8_len_of_lead(b: np.ndarray) -> np.ndarray:
    """Expected sequence length for a lead byte (0 for continuation or
    invalid leads — those never complete a character)."""
    return np.where(
        b < 0x80, 1,
        np.where(
            (b >= 0xC2) & (b <= 0xDF), 2,
            np.where((b >= 0xE0) & (b <= 0xEF), 3,
                     np.where((b >= 0xF0) & (b <= 0xF4), 4, 0)),
        ),
    )


def byte_classes_numpy(
    tables: CharClassTables, row: np.ndarray, n_total: int
) -> np.ndarray:
    """[len(row)] int32: char class at char-end bytes, SKIP inside chars,
    EOF at positions >= n_total. Pure per-position spec."""
    n = len(row)
    b = row.astype(np.int64)
    is_cont = (b & 0xC0) == 0x80
    out = np.where(is_cont, tables.cont_class, tables.skip_class).astype(np.int32)
    for p in range(min(n, n_total)):
        # k = number of continuation bytes ending at p (run backwards)
        k = 0
        while k < 3 and p - k >= 1 and is_cont[p - k]:
            k += 1
        lead_pos = p - k
        if is_cont[lead_pos]:
            continue  # run longer than 3: never a char end
        lead = int(b[lead_pos])
        if _utf8_len_of_lead(np.asarray(lead)) != k + 1:
            continue  # truncated/overlong position: not a char end
        if k == 0:
            cp = lead
        elif k == 1:
            cp = ((lead & 0x1F) << 6) | (int(b[p]) & 0x3F)
        elif k == 2:
            cp = ((lead & 0x0F) << 12) | ((int(b[p - 1]) & 0x3F) << 6) | (
                int(b[p]) & 0x3F
            )
        else:
            cp = (
                ((lead & 0x07) << 18)
                | ((int(b[p - 2]) & 0x3F) << 12)
                | ((int(b[p - 1]) & 0x3F) << 6)
                | (int(b[p]) & 0x3F)
            )
        out[p] = class_of_cp_tables(tables, cp)
    out[n_total:] = tables.eof_class
    return out


# ---------------------------------------------------------------------------
# jax device implementation
# ---------------------------------------------------------------------------


def prepare_device_tables(tables: CharClassTables):
    """Numpy arrays ready for device upload, int8-planed for exact MXU
    one-hot lookups (values <= 2^14 split into two 7-bit planes)."""
    pe = tables.page_entry.astype(np.int32)
    n_hi = (N_PAGES + 127) // 128
    padded = np.zeros(n_hi * 128, dtype=np.int32)
    padded[:N_PAGES] = pe
    # [128, n_hi*2] int8: column 2h is the low plane of hi-block h, 2h+1 high
    page_planes = np.zeros((128, n_hi * 2), dtype=np.int8)
    grid = padded.reshape(n_hi, 128)
    page_planes[:, 0::2] = (grid & 0x7F).T
    page_planes[:, 1::2] = (grid >> 7).T
    n_mixed = tables.mixed_rows.shape[0]
    # mixed rows transposed: [128, n_mixed] int8 (class ids < 128)
    mixed_t = tables.mixed_rows.astype(np.int8).T.copy()
    return dict(
        page_planes=page_planes,
        mixed_t=mixed_t,
        n_hi=n_hi,
        n_mixed=n_mixed,
    )


def make_byte_classes_fn(tables: CharClassTables, *, na_frac: int = 8):
    """jit-able: (page_planes, mixed_t, rows [B, L] u8, n_total [B] i32)
    -> (classes [B, L] int32, na_overflow bool scalar).

    Round-3 design (the v2 one-hot matmuls computed [N, 2*n_hi] and
    [N, n_mixed] intermediates — gigabytes of traffic per chunk, the
    single largest stage cost):

    - ASCII positions (the bulk of most corpora) take a pure bit-math
      path: class < 32, so 5 bitplanes of the 128-entry ASCII class
      table are compile-time u32 constants and each bit is a 4-way
      select + shift. No tables touched.
    - Non-ASCII char-end positions are compacted PER ROW (log2(L)
      radix rounds along the row axis) into an [B, L/na_frac] domain,
      the two-level page/mixed one-hot matmuls run on that small
      domain, and the classes scatter back at non-ASCII rate.
    - A chunk with more non-ASCII char-ends per row than the cap
      reports ``na_overflow``; callers re-dispatch through their
      worst-case variant (na_frac=2 — 2-byte chars bound char-end
      density at 1/2, so that variant cannot overflow).
    """
    import jax.numpy as jnp
    from jax import lax

    from tiktoken_tpu.ops.compaction import compact

    prep = prepare_device_tables(tables)
    n_hi = prep["n_hi"]
    n_mixed = prep["n_mixed"]
    SKIP = tables.skip_class
    CONT = tables.cont_class
    EOF = tables.eof_class

    # 128-entry ASCII class table as compile-time bitplane constants
    ascii_tbl = [class_of_cp_tables(tables, c) for c in range(128)]
    n_bits = max(int(v).bit_length() for v in ascii_tbl) or 1
    plane_words = []  # [n_bits][4] u32
    for p in range(n_bits):
        ws = [0, 0, 0, 0]
        for c, v in enumerate(ascii_tbl):
            ws[c >> 5] |= ((v >> p) & 1) << (c & 31)
        plane_words.append([np.uint32(w) for w in ws])

    def lookup_cp(cp):
        """Two-level page/mixed one-hot lookup (exact int8 matmuls);
        domain is whatever shape ``cp`` has."""
        shape = cp.shape
        page = cp >> PAGE_BITS
        hi = page >> 7
        lo = page & 127
        oh_lo = (lo[..., None] == jnp.arange(128, dtype=jnp.int32)).astype(jnp.int8)
        planes = lax.dot_general(
            oh_lo.reshape(-1, 128), _page_planes[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(shape + (n_hi, 2))
        oh_hi = (hi[..., None] == jnp.arange(n_hi, dtype=jnp.int32)).astype(jnp.int32)
        entry_lo = jnp.sum(planes[..., 0] * oh_hi, axis=-1)
        entry_hi = jnp.sum(planes[..., 1] * oh_hi, axis=-1)
        entry = entry_lo | (entry_hi << 7)

        is_mixed = (entry & MIXED_FLAG) != 0
        mixed_idx = jnp.where(is_mixed, entry & (MIXED_FLAG - 1), 0)

        cpl = cp & ((1 << PAGE_BITS) - 1)
        oh_cpl = (cpl[..., None] == jnp.arange(128, dtype=jnp.int32)).astype(jnp.int8)
        mrows = lax.dot_general(
            oh_cpl.reshape(-1, 128), _page_planes[1],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(shape + (n_mixed,))
        oh_m = (mixed_idx[..., None] == jnp.arange(n_mixed, dtype=jnp.int32)).astype(
            jnp.int32
        )
        mixed_cls = jnp.sum(mrows * oh_m, axis=-1)
        return jnp.where(is_mixed, mixed_cls, entry)

    _page_planes = [None, None]  # bound per call below

    def fn(page_planes, mixed_t, rows, n_total):
        _page_planes[0] = page_planes
        _page_planes[1] = mixed_t
        B, L = rows.shape
        b = rows.astype(jnp.int32)
        z = jnp.zeros((B, 1), jnp.int32)
        b1 = jnp.concatenate([z, b[:, :-1]], axis=1)  # byte at p-1
        b2 = jnp.concatenate([z, b1[:, :-1]], axis=1)
        b3 = jnp.concatenate([z, b2[:, :-1]], axis=1)

        cont = (b & 0xC0) == 0x80
        cont1 = (b1 & 0xC0) == 0x80
        cont2 = (b2 & 0xC0) == 0x80
        cont3 = (b3 & 0xC0) == 0x80
        # continuation run length ending at p (capped at 3)
        k = jnp.where(
            cont,
            jnp.where(cont1, jnp.where(cont2, jnp.where(cont3, 4, 3), 2), 1),
            0,
        )
        lead = jnp.where(k == 0, b, jnp.where(k == 1, b1, jnp.where(k == 2, b2, b3)))
        explen = jnp.where(
            lead < 0x80, 1,
            jnp.where(
                (lead >= 0xC2) & (lead <= 0xDF), 2,
                jnp.where((lead >= 0xE0) & (lead <= 0xEF), 3,
                          jnp.where((lead >= 0xF0) & (lead <= 0xF4), 4, 0)),
            ),
        )
        char_end = (explen == k + 1) & (k < 4)

        # ---- ASCII fast path: 5 bitplane selects, no tables ----------------
        xs = b.astype(jnp.uint32)
        sh = xs & 31
        ascii_cls = jnp.zeros((B, L), jnp.int32)
        for p in range(n_bits):
            C0, C1, C2, C3 = plane_words[p]
            w = jnp.where(
                xs < 32, C0,
                jnp.where(xs < 64, C1, jnp.where(xs < 96, C2, C3)),
            )
            ascii_cls = ascii_cls | (((w >> sh) & 1) << p).astype(jnp.int32)

        # ---- non-ASCII char ends: compact -> small lookup -> scatter -------
        cp = jnp.where(
            k == 1, ((lead & 0x1F) << 6) | (b & 0x3F),
            jnp.where(
                k == 2,
                ((lead & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b & 0x3F),
                ((lead & 0x07) << 18) | ((b2 & 0x3F) << 12)
                | ((b1 & 0x3F) << 6) | (b & 0x3F),
            ),
        )
        cp = jnp.clip(cp, 0, 0x10FFFF)
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        na = char_end & cont & (pos < n_total[:, None])
        if na_frac <= 2:
            NA = L // 2 + 1  # 2-byte chars bound char-end density at 1/2
        else:
            NA = max(8, -(-L // na_frac))
        (c_cp, c_pos), n_na = compact(na, [cp, pos + jnp.zeros((B, 1), jnp.int32)], NA)
        na_overflow = (n_na > NA).any()

        cls_small = lookup_cp(jnp.clip(c_cp, 0x80, 0x10FFFF))

        rows_i = jnp.arange(B, dtype=jnp.int32)[:, None]
        valid_s = jnp.arange(NA, dtype=jnp.int32)[None, :] < n_na[:, None]
        tgt = jnp.where(valid_s, rows_i * L + c_pos, B * L)
        na_cls = (
            jnp.zeros((B * L + 1,), jnp.int32)
            .at[tgt.reshape(-1)]
            .set(cls_small.reshape(-1), mode="drop")[: B * L]
            .reshape(B, L)
        )

        out = jnp.where(
            char_end,
            jnp.where(cont, na_cls, ascii_cls),
            jnp.where(cont, CONT, SKIP),
        )
        return (
            jnp.where(pos >= n_total[:, None], EOF, out),
            na_overflow,
        )

    return fn
