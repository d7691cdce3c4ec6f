"""Device pipeline v3: handshake rows + monotone-routing stages.

Differences from v2 (ops/pipeline2.py), each removing a measured
bottleneck (scripts/profile_v2.py):

- **Speculative-handoff packing** replaces safe-split packing: rows are
  cut every ~K bytes at any character boundary (script-agnostic — CJK,
  Cyrillic, anything), scanned speculatively from their start, and
  validated against the previous row's handoff boundary ``spec_f``
  entirely on device (a shift across the batch dim — consecutive rows of
  a document are adjacent; the reference's analogous boundary
  bookkeeping is last_piece_token_len, src/lib.rs:439-441). Documents
  whose rows fail validation (only K-long phase-locked runs, e.g. giant
  digit strings) fall back whole. Upload ships the corpus bytes ONCE
  (flat) + row offsets; the device gathers rows (one wide row-gather per
  row), so the lookahead margin costs no host-link bandwidth.
- **Butterfly catalog/extract/assembly** (ops/compaction): the v2
  `nonzero`/scatter catalog (~15 ms/MB), per-piece word gathers
  (~35 ms/MB) and masked-scatter assembly become monotone radix routes —
  log-depth shift+select rounds of pure VPU work. The only remaining
  random accesses run at piece/token rate: the vocab-hit bucket row
  gather, the merge loops' pair probes, and one packed-token fetch.
- Cap overflow no longer reruns through the v1 window-scan pipeline
  (whose packing contract v3 rows do not satisfy): an overflowing chunk
  flags all its rows and the affected documents take the host path.

Static caps are fractions of the chunk's payload; every overflow is
surfaced in the header, never silent.
"""

from __future__ import annotations

import numpy as np

from tiktoken_tpu.ops.charclass import CharClassTables, make_byte_classes_fn
from tiktoken_tpu.ops.compaction import compact, expand
from tiktoken_tpu.ops.pieces import (
    LONG_SLOT,
    MISS,
    SLOT,
    make_long_vocab_hit_fn,
    make_vocab_hit_fn,
)
from tiktoken_tpu.ops.slot_merge import make_slot_merge_fn
from tiktoken_tpu.ops.sweep_scan import make_char_scan_fn

K_DEFAULT = 176  # nominal payload bytes per row (cuts land in [K-backup, K])
FWD = 80  # straddler-resolution margin: LONG_SLOT + lookahead slack
DIGIT_BACKUP = 40  # max bytes a cut backs out of an ASCII digit run
PAY_PAD = DIGIT_BACKUP + 8  # cut backup can lengthen the following row


def row_geometry(K: int) -> tuple[int, int]:
    """(KP, KL): payload capacity and full row-buffer length."""
    KP = K + PAY_PAD
    return KP, KP + FWD


from dataclasses import dataclass
from typing import Sequence


@dataclass
class PackedCorpus3:
    """Handshake-packed corpus: the bytes ship once, rows are described
    by offsets and gathered on device."""

    flat: np.ndarray  # concatenated doc bytes + KL tail padding, uint8
    row_off: np.ndarray  # [B] int32 absolute offsets into flat
    n_payload: np.ndarray  # [B] int32 (<= K + PAY_PAD)
    n_total: np.ndarray  # [B] int32 valid bytes in the row buffer
    is_doc_end: np.ndarray  # [B] bool: row buffer reaches its doc's end
    prev_same_doc: np.ndarray  # [B] bool: previous batch row is same doc
    doc_index: np.ndarray  # [B] int32
    K: int


def _doc_cuts_np(data: np.ndarray, K: int) -> np.ndarray:
    """Cut positions for one document, numpy reference implementation.

    Candidate cut positions: character starts that do not fall inside an
    ASCII digit run. Digit runs are the one piece family whose
    boundaries are phase-locked to the run START (\\p{N}{1,3}), so a
    speculative scan beginning mid-run can never resync; every other run
    family ends at a content-determined position and self-syncs. Runs
    longer than DIGIT_BACKUP keep the in-run cut (rare; the handshake
    flags them and the document falls back)."""
    n = len(data)
    is_digit = (data >= 0x30) & (data <= 0x39)
    in_run = np.zeros(n, dtype=bool)
    in_run[1:] = is_digit[1:] & is_digit[:-1]
    okpos = ((data & 0xC0) != 0x80) & ~in_run
    nc = np.nonzero(okpos)[0]
    grid = np.arange(K, n, K, dtype=np.int64)
    cuts = nc[np.searchsorted(nc, grid, side="right") - 1]
    # keep forward progress: if backing out of a digit run moved a
    # cut more than DIGIT_BACKUP bytes, take the raw char cut
    ncc = np.nonzero((data & 0xC0) != 0x80)[0]
    raw = ncc[np.searchsorted(ncc, grid, side="right") - 1]
    cuts = np.where(raw - cuts > min(DIGIT_BACKUP, K // 2), raw, cuts)
    cuts = np.unique(cuts)
    return cuts[(cuts > 0) & (cuts < n)]


def _doc_cuts(data: np.ndarray, K: int) -> np.ndarray:
    """Cut positions for one document: native single-pass scan when the
    host core is built (~50x the numpy reference, which makes ~10 full
    passes over the bytes), else the numpy reference."""
    from tiktoken_tpu.native import pack_cuts3

    cuts = pack_cuts3(data, K, DIGIT_BACKUP)
    if cuts is None:
        return _doc_cuts_np(data, K)
    return cuts


def pack_corpus3(docs: Sequence[bytes], K: int = K_DEFAULT) -> PackedCorpus3:
    """Cut each document every ~K bytes at a character boundary (backing
    up over at most 3 continuation bytes — script-agnostic). Fully
    vectorized per document."""
    KP, KL = row_geometry(K)
    offs, pays, tots, ends, prevs, dix = [], [], [], [], [], []
    parts: list[np.ndarray] = []
    base = 0
    for d_i, doc in enumerate(docs):
        data = np.frombuffer(doc, dtype=np.uint8)
        n = len(data)
        if n == 0:
            continue
        parts.append(data)
        if n <= K:
            bounds = np.asarray([0, n], dtype=np.int64)
        else:
            cuts = _doc_cuts(data, K)
            bounds = np.concatenate([[0], cuts, [n]])
        starts = bounds[:-1]
        pay = np.diff(bounds)
        assert pay.max(initial=0) <= KP, "char backup exceeded PAY_PAD"
        tot = np.minimum(n - starts, KL)
        offs.append(base + starts)
        pays.append(pay)
        tots.append(tot)
        ends.append(starts + tot == n)
        pv = np.ones(len(starts), dtype=bool)
        pv[0] = False
        prevs.append(pv)
        dix.append(np.full(len(starts), d_i, dtype=np.int32))
        base += n
    if not parts:
        z = np.zeros(0, np.int32)
        return PackedCorpus3(
            flat=np.zeros(KL, np.uint8), row_off=z, n_payload=z, n_total=z,
            is_doc_end=np.zeros(0, bool), prev_same_doc=np.zeros(0, bool),
            doc_index=z, K=K,
        )
    flat = np.concatenate(parts + [np.zeros(KL + 4, np.uint8)])
    return PackedCorpus3(
        flat=flat,
        row_off=np.concatenate(offs).astype(np.int32),
        n_payload=np.concatenate(pays).astype(np.int32),
        n_total=np.concatenate(tots).astype(np.int32),
        is_doc_end=np.concatenate(ends),
        prev_same_doc=np.concatenate(prevs),
        doc_index=np.concatenate(dix),
        K=K,
    )


def chunk_inputs3(pc: "PackedCorpus3", lo: int, R: int, C: int, S: int):
    """Host-side inputs for one handshake chunk: real rows [lo, lo+R)
    plus the leading ghost (the previous row, which re-provides its
    handoff boundary and emits nothing). Returns ((flat, off, pay, tot,
    dend, prev, emit), nreal)."""
    B = pc.row_off.shape[0]
    hi = min(lo + R, B)
    nreal = hi - lo
    idx = np.arange(lo, hi)
    ghost = lo - 1  # -1 = dummy for the first chunk

    off = np.zeros(C, np.int32)
    pay = np.zeros(C, np.int32)
    tot = np.zeros(C, np.int32)
    dend = np.zeros(C, bool)
    prev = np.zeros(C, bool)
    emit = np.zeros(C, bool)
    rows_sel = np.concatenate([[ghost if ghost >= 0 else lo], idx])
    off_abs = pc.row_off[rows_sel].astype(np.int64)
    base = int(off_abs.min())
    off[: nreal + 1] = (off_abs - base).astype(np.int32)
    pay[1 : nreal + 1] = pc.n_payload[idx]
    tot[1 : nreal + 1] = pc.n_total[idx]
    dend[1 : nreal + 1] = pc.is_doc_end[idx]
    prev[1 : nreal + 1] = pc.prev_same_doc[idx]
    emit[1 : nreal + 1] = True
    if ghost >= 0:
        pay[0] = pc.n_payload[ghost]
        tot[0] = pc.n_total[ghost]
        dend[0] = pc.is_doc_end[ghost]
    flat = pc.flat[base : base + S]
    if flat.shape[0] < S:
        flat = np.concatenate([flat, np.zeros(S - flat.shape[0], np.uint8)])
    return (flat, off, pay, tot, dend, prev, emit), nreal


def build_pipeline3_fn(
    *,
    K: int,
    C: int,
    flat_size: int,
    char_tables: CharClassTables,
    pair_seed: int,
    pair_buckets: int,
    vocab_seed: int,
    vocab_buckets: int,
    long_seed: int,
    long_buckets: int,
    pack24: bool = False,
    worst_case: bool = False,
    stage_stop: str | None = None,
):
    """The pure jit-able v3 pipeline for a fixed (C rows, K payload)
    chunk geometry.

    Signature:
        (scan_tables (page_planes, mixed_t), pair_rows, byte_to_rank,
         vocab_rows (short_buckets, long_buckets),
         flat [flat_size] u8, row_off [C] i32, n_payload [C] i32,
         n_total [C] i32, is_doc_end [C] bool, prev_same_doc [C] bool,
         emit [C] bool)
        -> (flat_tokens [t_cap or 3t_cap/4-packed] u32,
            header [2C+2] i32 = [row_counts | row_bad | n_tokens | overflow])
    """
    import jax
    import jax.numpy as jnp

    KP, KL = row_geometry(K)
    N = C * KP
    NX = C * KL
    # caps sized for realistic piece/miss/token densities; a chunk that
    # overflows any of them is re-dispatched through the worst_case
    # variant, whose caps cover the densest legal inputs (a piece per
    # byte, a token per byte, a miss per two bytes) and so cannot
    # overflow — no chunk ever falls back for cap reasons alone
    if worst_case:
        p_cap = N + 256
        m_cap = N // 2 + 256
        l_cap = N // 17 + 64
        t_cap = -(-(N + 512) // 4) * 4
    else:
        # measured densities on the bench corpus (100k vocab, TPU stage
        # profile 2026-08-19): pieces 0.122N, misses 0.0072N, longs
        # 0.00053N, tokens 0.131N. Merge-arena cost is linear in these
        # caps (the r0 adjacency probe alone is (W-1) bucket gathers per
        # lane), so miss/long caps carry ~2x headroom; the piece cap
        # keeps more (real English under o200k runs ~0.18-0.2 pieces/N,
        # denser than the bench corpus). A chunk that overflows any cap
        # re-dispatches through the pre-compiled worst_case variant, so
        # an undersized cap costs latency, never correctness.
        import os as _os

        def _div(name, default):
            v = _os.environ.get(f"TIKTOKEN_TPU_{name}_DIV")
            return int(v) if v else default

        # MCAP 96 = 1.45x headroom over the bench corpus's 0.0072N miss
        # density — measured 6.7% faster end-to-end than the old 64
        # (scripts/sweep_knobs.py, TPU v5e 2026-08-19); denser corpora
        # overflow into the worst-case retry, costing latency only
        p_cap = max(256, N // _div("PCAP", 5))
        m_cap = max(256, N // _div("MCAP", 96))
        l_cap = max(64, N // _div("LCAP", 1024))
        t_cap = -(-max(512, N // _div("TCAP", 5)) // 4) * 4

    # worst_case also lifts the non-ASCII char-end cap to its 1/2-density
    # bound, so the retry variant can never overflow on the class map
    classes_fn = make_byte_classes_fn(
        char_tables, na_frac=2 if worst_case else 8
    )
    # unroll depths resolve per backend inside the kernel builders: deep
    # bodies divide the TPU while_loop iteration floor (HARDWARE.md),
    # shallow ones keep XLA:CPU compiles fast (sweep_scan.resolve_unroll)
    scan_fn = make_char_scan_fn(char_tables, KL, KP, handshake=True)
    hit_fn = make_vocab_hit_fn(vocab_seed, vocab_buckets)
    long_hit_fn = make_long_vocab_hit_fn(long_seed, long_buckets)
    import os as _os2

    def _unroll(name, default):
        v = _os2.environ.get(f"TIKTOKEN_TPU_{name}_UNROLL")
        return int(v) if v else default

    merge16 = make_slot_merge_fn(
        pair_seed, pair_buckets, SLOT, unroll=_unroll("MERGE16", 8)
    )
    merge64 = make_slot_merge_fn(
        pair_seed, pair_buckets, LONG_SLOT, unroll=_unroll("MERGE64", 16)
    )
    eof_cls = char_tables.eof_class

    # row gather: vmap(dynamic_slice) lowers to a per-ELEMENT gather
    # (~10ns/byte — 35 ms/chunk measured), so gather 128-byte blocks
    # instead (HARDWARE.md: wide row gathers run at ~125M rows/s) and
    # realign in registers with a 32-way word-shift sweep.
    NW_ROW = KL // 4 + 1
    NBLK = (127 + KL + 3) // 128 + 1  # blocks covering any alignment

    def row_gather(flat, row_off):
        blocks = jax.lax.bitcast_convert_type(
            flat.reshape(-1, 128 // 4, 4), jnp.uint32
        )  # [S/128, 32] little-endian words per 128B block
        bidx = (row_off >> 7)[:, None] + jnp.arange(NBLK, dtype=jnp.int32)[None, :]
        bidx = jnp.minimum(bidx, blocks.shape[0] - 1)
        w_in = blocks[bidx].reshape(-1, NBLK * 32)  # [C, NBLK*32]
        ws = ((row_off & 127) >> 2).astype(jnp.int32)  # word shift 0..31
        out = jnp.zeros((w_in.shape[0], NW_ROW), jnp.uint32)
        for s in range(32):
            out = jnp.where(
                (ws == s)[:, None], jax.lax.dynamic_slice_in_dim(w_in, s, NW_ROW, 1),
                out,
            )
        r = ((row_off & 3).astype(jnp.uint32) * 8)[:, None]
        lo = out[:, :-1] >> r
        hi = jnp.where(r > 0, out[:, 1:] << (32 - r), 0)
        words = lo | hi  # [C, NW_ROW-1]
        byts = jax.lax.bitcast_convert_type(words[:, :, None], jnp.uint8)
        return byts.reshape(words.shape[0], (NW_ROW - 1) * 4)[:, :KL]

    def route_right(dst, values, out_size):
        """Monotone rightward radix route of `values` to slots `dst`
        (strictly increasing over routed entries; dst < 0 drops). High
        displacement bits first (see ops/compaction.expand)."""
        n = values.shape[0]
        m = max(n, out_size)
        if m > n:
            pad = m - n
            dst = jnp.concatenate([dst, jnp.full((pad,), -1, dst.dtype)])
            values = jnp.concatenate([values, jnp.zeros((pad,), values.dtype)])
        disp = jnp.where(dst >= 0, dst - jnp.arange(m, dtype=jnp.int32), -1)
        rounds = max(1, (m - 1).bit_length())
        for b in reversed(range(rounds)):
            step = 1 << b
            move = (disp >= 0) & ((disp & step) != 0)
            take = jnp.concatenate([jnp.zeros((step,), bool), move[:-step]])
            keep = (disp >= 0) & ~move
            sh = lambda a, fill: jnp.concatenate(
                [jnp.full((step,), fill, a.dtype), a[:-step]]
            )
            values = jnp.where(take, sh(values, 0), jnp.where(keep, values, 0))
            disp = jnp.where(take, sh(disp, -1) - step, jnp.where(keep, disp, -1))
        return values[:out_size]

    def extract_long(rows, starts, lens):
        """[l_cap, 64] u8 long-piece slots from the row grid (rare:
        one 17-word gather per long piece)."""
        flat = rows.reshape(-1)
        flat32 = jax.lax.bitcast_convert_type(
            flat.reshape(-1, 4), jnp.uint32
        ).reshape(-1)
        flat32 = jnp.concatenate([flat32, jnp.zeros((24,), jnp.uint32)])
        w0 = jnp.minimum(starts >> 2, NX // 4)
        colw = w0[:, None] + jnp.arange(17, dtype=jnp.int32)[None, :]
        w = flat32[colw]
        shift = ((starts & 3) << 3).astype(jnp.uint32)[:, None]
        lo = w[:, :16] >> shift
        hi = jnp.where(shift > 0, w[:, 1:17] << (32 - shift), 0)
        words = (lo | hi).astype(jnp.uint32)
        b = jax.lax.bitcast_convert_type(words[:, :, None], jnp.uint8)
        byts = b.reshape(words.shape[0], 64)
        cols64 = jnp.arange(LONG_SLOT, dtype=jnp.int32)
        return jnp.where(cols64[None, :] < lens[:, None], byts, 0)

    def pipeline(
        scan_tables, pair_rows, byte_to_rank, vocab_rows,
        flat, row_off, n_payload, n_total, is_doc_end, prev_same_doc, emit,
    ):
        page_planes, mixed_t = scan_tables
        vocab_rows, vocab_long_rows = vocab_rows
        rows = row_gather(flat, row_off)  # [C, KL] u8
        if stage_stop == "rows":  # profiling bisect point
            return (
                jnp.zeros((4,), jnp.uint32).at[0].set(
                    rows.astype(jnp.uint32).sum()
                ),
                jnp.zeros((2 * C + 2,), jnp.int32),
            )

        cls, na_overflow = classes_fn(page_planes, mixed_t, rows, n_total)
        if stage_stop == "classes":  # profiling bisect point
            return (
                jnp.zeros((4,), jnp.uint32).at[0].set(
                    cls.astype(jnp.uint32).sum()
                ),
                jnp.zeros((2 * C + 2,), jnp.int32).at[0].set(
                    na_overflow.astype(jnp.int32)
                ),
            )
        cls_ext = jnp.concatenate(
            [cls, jnp.full((C, 1), eof_cls, cls.dtype)], axis=1
        )
        mask, spec_f, row_bad = scan_fn(cls_ext, n_payload, n_total, is_doc_end)
        if stage_stop == "scan":  # profiling bisect point
            return (
                jnp.zeros((4,), jnp.uint32).at[0].set(
                    mask.sum() + spec_f.sum().astype(jnp.uint32)
                ),
                jnp.zeros((2 * C + 2,), jnp.int32).at[0].set(
                    row_bad.sum().astype(jnp.int32)
                ),
            )

        # ---- handshake validation (device-side, batch shift) --------------
        z1 = jnp.zeros((1,), jnp.int32)
        prev_f = jnp.concatenate([z1, spec_f[:-1]])
        prev_pay = jnp.concatenate([z1, n_payload[:-1]])
        g = jnp.where(prev_same_doc, prev_f - prev_pay, 0)
        g = jnp.clip(g, 0, KP)
        gbit = jnp.take_along_axis(
            mask, jnp.clip(g, 0, KP - 1)[:, None], axis=1
        )[:, 0]
        ok = gbit | (g == n_payload)
        row_bad = row_bad | (prev_same_doc & ~ok)

        colsKP = jnp.arange(KP, dtype=jnp.int32)[None, :]
        mask3 = mask & (colsKP >= g[:, None]) & emit[:, None]

        # ---- catalog + extract: ONE monotone route ------------------------
        # Each grid position carries a sliding 16-byte word view (W0, W4,
        # W8, W12: the 4 packed little-endian words starting at that
        # byte — pure shifts of the row word stream) plus its packed
        # (row, col, row-end) metadata; compacting the piece-START
        # positions therefore yields every piece's slot words AND its
        # catalog entry in a single log-depth pass. This replaces the v3.0
        # three-route chain (catalog compact, dense byte compact, byte
        # arena route over p_cap*SLOT elements) whose round-traffic
        # dominated the measured stage costs (docs/ROADMAP.md).
        assert C * KL < (1 << 31), "meta packing bounds"
        NW_R = (KL + 3) // 4
        rows_p = rows
        if NW_R * 4 != KL:
            rows_p = jnp.concatenate(
                [rows, jnp.zeros((C, NW_R * 4 - KL), jnp.uint8)], axis=1
            )
        rwords = jax.lax.bitcast_convert_type(
            rows_p.reshape(C, NW_R, 4), jnp.uint32
        )  # [C, NW_R]
        rnext = jnp.concatenate(
            [rwords[:, 1:], jnp.zeros((C, 1), jnp.uint32)], axis=1
        )
        # byte-granular word view: variants[r][c, w] = word starting at
        # byte 4w+r; interleave -> [C, KL] (word starting at every byte)
        variants = [rwords] + [
            (rwords >> jnp.uint32(8 * r)) | (rnext << jnp.uint32(32 - 8 * r))
            for r in (1, 2, 3)
        ]
        Wgrid = jnp.stack(variants, axis=2).reshape(C, NW_R * 4)[:, :KL]

        def wshift(k):
            return jnp.concatenate(
                [Wgrid[:, k:], jnp.zeros((C, k), jnp.uint32)], axis=1
            ).reshape(-1)

        rows_i = jnp.arange(C, dtype=jnp.int32)
        colsKL = jnp.arange(KL, dtype=jnp.int32)[None, :]
        # meta = the flat grid index (row*KL + col): fits any chunk
        # geometry in 32 bits; the row end (spec_f) is re-attached after
        # compaction by one piece-rate gather instead of riding in the
        # meta bits (which capped C at 2^14 rows)
        meta = (rows_i[:, None] * KL + colsKL).astype(jnp.uint32)
        mask3x = jnp.concatenate(
            [mask3, jnp.zeros((C, KL - KP), bool)], axis=1
        )  # [C, KL]
        (c_meta, sw0, sw1, sw2, sw3), n_pieces = compact(
            mask3x.reshape(-1),
            [meta.reshape(-1), Wgrid.reshape(-1), wshift(4), wshift(8),
             wshift(12)],
            p_cap,
        )
        if stage_stop == "catalog":  # profiling bisect point
            return (
                jnp.zeros((4,), jnp.uint32).at[0].set(
                    c_meta.sum() + sw0.sum() + sw1.sum() + sw2.sum()
                    + sw3.sum()
                ),
                jnp.zeros((2 * C + 2,), jnp.int32).at[0].set(n_pieces),
            )
        overflow = n_pieces > p_cap
        live = jnp.arange(p_cap, dtype=jnp.int32) < n_pieces
        starts = c_meta.astype(jnp.int32)
        prow = starts // KL  # constant divisor: lowers to multiply+shift
        pend = prow * KL + jnp.take(  # row end = spec_f, piece-rate gather
            spec_f, jnp.clip(prow, 0, C - 1)
        )
        nxt = jnp.concatenate([starts[1:], jnp.zeros((1,), starts.dtype)])
        nxt_row = jnp.concatenate([prow[1:], jnp.full((1,), -1, prow.dtype)])
        ends = jnp.where((nxt_row == prow) & live, nxt, pend)
        lens = jnp.where(live, ends - starts, 0)

        # pieces the device cannot merge: flag their rows (piece-rate
        # scatter, rare in effect)
        too_long = lens > LONG_SLOT
        row_bad = row_bad | (
            jnp.zeros((C,), bool)
            .at[jnp.where(too_long, prow, 0)]
            .max(too_long)
        )

        # canonical zero-padding past len (same mask as pieces.extract)
        lens16 = jnp.clip(lens, 0, SLOT)
        words = jnp.stack([sw0, sw1, sw2, sw3], axis=1)  # [p_cap, 4]
        byte_idx = jnp.arange(4, dtype=jnp.int32)[None, :]
        nbytes = jnp.clip(lens16[:, None] - byte_idx * 4, 0, 4)
        wmask = jnp.where(
            nbytes >= 4,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << (nbytes.astype(jnp.uint32) << 3)) - 1,
        )
        words = words & wmask
        slot_bytes = jax.lax.bitcast_convert_type(
            words[:, :, None], jnp.uint8
        ).reshape(p_cap, SLOT)

        hit = hit_fn(vocab_rows, words, jnp.where(lens <= SLOT, lens, 0))
        if stage_stop == "hit":  # profiling bisect point
            return (
                jnp.zeros((4,), jnp.uint32).at[0].set(hit.sum()),
                jnp.zeros((2 * C + 2,), jnp.int32).at[0].set(n_pieces),
            )

        # ---- short misses -------------------------------------------------
        is_short_miss = live & (lens >= 2) & (lens <= SLOT) & (hit == MISS)
        mslot_of_piece = jnp.cumsum(is_short_miss.astype(jnp.int32)) - 1
        piece_idx = jnp.arange(p_cap, dtype=jnp.int32)
        m_cols, n_miss = compact(
            is_short_miss,
            [words[:, i] for i in range(4)] + [lens, piece_idx],
            m_cap,
        )
        m_overflow = n_miss > m_cap
        m_real = jnp.arange(m_cap, dtype=jnp.int32) < n_miss
        m_bytes = jax.lax.bitcast_convert_type(
            jnp.stack(m_cols[:4], axis=1)[:, :, None], jnp.uint8
        ).reshape(m_cap, SLOT)
        m_lens = jnp.where(m_real, m_cols[4], 0)
        m_pid = m_cols[5]
        if stage_stop == "nomerge":  # profiling bisect: skip both merges
            m_tok = jnp.zeros((m_cap, SLOT), jnp.uint32)
            m_alive = jnp.zeros((m_cap, SLOT), bool).at[:, 0].set(m_real)
        else:
            m_tok, m_alive, _r1 = merge16(pair_rows, byte_to_rank, m_bytes, m_lens)
        m_alive = m_alive & m_real[:, None]
        m_counts = jnp.sum(m_alive.astype(jnp.int32), axis=1)
        (m_tok_p,), _ = compact(m_alive, [m_tok], SLOT)

        # ---- long pieces --------------------------------------------------
        is_long = live & (lens > SLOT) & (lens <= LONG_SLOT)
        lslot_of_piece = jnp.cumsum(is_long.astype(jnp.int32)) - 1
        (l_starts, l_lens_c, l_pid), n_long = compact(
            is_long, [starts, lens, piece_idx], l_cap
        )
        l_overflow = n_long > l_cap
        l_real = jnp.arange(l_cap, dtype=jnp.int32) < n_long
        l_lens = jnp.where(l_real, l_lens_c, 0)
        l_bytes = extract_long(rows, l_starts, l_lens)
        # whole-piece hits for 17..64-byte tokens skip the merge loop
        # entirely — reference vocab-as-cache semantics at every length
        # the device handles (reference: src/lib.rs:367-369)
        l_hit = long_hit_fn(vocab_long_rows, l_bytes, l_lens)
        l_is_hit = l_hit != MISS
        if stage_stop in ("nomerge", "m16"):  # "m16": merge16 only
            l_tok = jnp.zeros((l_cap, LONG_SLOT), jnp.uint32)
            l_alive = jnp.zeros((l_cap, LONG_SLOT), bool).at[:, 0].set(l_real)
        else:
            l_tok, l_alive, _r2 = merge64(
                pair_rows, byte_to_rank, l_bytes,
                jnp.where(l_is_hit, 0, l_lens),
            )
            lane0 = jnp.arange(LONG_SLOT, dtype=jnp.int32)[None, :] == 0
            l_tok = jnp.where(lane0 & l_is_hit[:, None], l_hit[:, None], l_tok)
            l_alive = l_alive | (lane0 & l_is_hit[:, None])
        l_alive = l_alive & l_real[:, None]
        l_counts = jnp.sum(l_alive.astype(jnp.int32), axis=1)
        (l_tok_p,), _ = compact(l_alive, [l_tok], LONG_SLOT)

        # ---- per-piece token counts (merge results routed back) -----------
        first_byte = slot_bytes[:, 0].astype(jnp.int32)
        single_tok = jnp.where(lens == 1, byte_to_rank[first_byte], hit)
        is_single = live & (
            (lens == 1) | ((lens >= 2) & (lens <= SLOT) & (hit != MISS))
        )
        m_dst = jnp.where(m_real, m_pid, -1)
        counts_m = route_right(m_dst, m_counts, p_cap)
        l_dst = jnp.where(l_real, l_pid, -1)
        counts_l = route_right(l_dst, l_counts, p_cap)
        counts = jnp.where(
            is_single, 1, jnp.where(is_short_miss, counts_m,
                                    jnp.where(is_long, counts_l, 0))
        )

        # unified packed-token base: short-miss slot s -> s*16, long slot
        # s -> m_cap*16 + s*64; singles carry their value in-band
        base = jnp.where(
            is_short_miss,
            jnp.clip(mslot_of_piece, 0, m_cap - 1) * SLOT,
            jnp.where(
                is_long,
                m_cap * SLOT
                + jnp.clip(lslot_of_piece, 0, l_cap - 1) * LONG_SLOT,
                0,
            ),
        )
        # ONE expand payload (the routing network's traffic is linear in
        # payload count x log2(t_cap) rounds): bit 31 flags a single
        # piece whose low bits carry the token id directly; otherwise the
        # low bits carry the unified slot base. Token ids < 2^31
        # (asserted at table build).
        combo = jnp.where(
            is_single,
            single_tok | jnp.uint32(0x80000000),
            base.astype(jnp.uint32),
        )
        (e_combo,), e_k, e_valid, n_tokens = expand(counts, [combo], t_cap)
        t_overflow = n_tokens > t_cap
        e_low = (e_combo & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        unified = jnp.concatenate([m_tok_p.reshape(-1), l_tok_p.reshape(-1)])
        fetched = unified[jnp.clip(e_low + e_k, 0, unified.shape[0] - 1)]
        flat_tok = jnp.where(
            e_valid,
            jnp.where((e_combo >> 31) != 0, e_low.astype(jnp.uint32), fetched),
            0,
        ).astype(jnp.uint32)

        # per-row token counts: the piece catalog is grid-ordered, so
        # prow is non-decreasing over live lanes — two binary searches
        # per row on the counts prefix sum replace a p_cap-rate scatter
        pos_sorted = jnp.where(live, prow, C)
        cs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(jnp.where(live, counts, 0))]
        )
        rows_r = jnp.arange(C, dtype=jnp.int32)
        lo_i = jnp.searchsorted(pos_sorted, rows_r, side="left")
        hi_i = jnp.searchsorted(pos_sorted, rows_r, side="right")
        row_counts = cs[hi_i] - cs[lo_i]

        overflow = overflow | m_overflow | l_overflow | t_overflow | na_overflow
        if pack24:
            b0 = (flat_tok & 0xFF).astype(jnp.uint8)
            b1 = ((flat_tok >> 8) & 0xFF).astype(jnp.uint8)
            b2 = ((flat_tok >> 16) & 0xFF).astype(jnp.uint8)
            bytes3 = jnp.stack([b0, b1, b2], axis=1).reshape(-1)
            flat_tok = jax.lax.bitcast_convert_type(
                bytes3.reshape(-1, 4), jnp.uint32
            )

        # density telemetry (cap tuning / profiling; engine consumers
        # index [:C], [C:2C], [-2], [-1] so inserting here is compatible)
        header = jnp.concatenate(
            [
                row_counts,
                row_bad.astype(jnp.int32),
                n_pieces[None].astype(jnp.int32),
                n_miss[None].astype(jnp.int32),
                n_long[None].astype(jnp.int32),
                n_tokens[None].astype(jnp.int32),
                overflow.astype(jnp.int32)[None],
            ]
        )
        return flat_tok, header

    return pipeline
