"""Data-parallel corpus encoding over a device mesh.

Replaces the reference's ThreadPoolExecutor batch layer (reference:
tiktoken/core.py:164-206) with SPMD over a ``jax.sharding.Mesh``: packed
byte rows are sharded along the batch axis, the compiled tables are
replicated, and one jitted program runs on every chip via ``shard_map``.
The forward pass is collective-free by design (rows are independent, and
the scan's data-dependent trip counts make in-graph collectives trip
XLA's CPU rendezvous stuck-detector under load); per-shard counters are
summed on the host, and the balanced distributed train step
(parallel/train.py) carries the psum demonstration.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np

from tiktoken_tpu.ops.engine import LOOK, DeviceEngine, PackedBatch, pack_documents
from tiktoken_tpu.parallel.mesh import DATA_AXIS, batch_sharded, replicated

_TABLE_NAMES = (
    "packed", "class_of", "buckets", "byte_to_rank"
)
_TABLE_NAMES2 = (
    "scan2", "buckets", "byte_to_rank", "vocab"
)


@dataclass
class CorpusStats:
    """host-reduced corpus counters (summed over shard partials)."""

    rows: int
    payload_bytes: int
    tokens: int
    fallback_rows: int
    merge_rounds: int


class ShardedEngine:
    """A :class:`DeviceEngine` spread over a 1-D data mesh.

    Rows are padded to a multiple of the mesh size and sharded along the
    batch dim; empty padding rows tokenize to zero tokens, so results are
    unaffected. Tables are replicated (they are a few MB; see SURVEY.md
    §2.4). The whole pipeline is a single pjit-style program with no
    collectives at all (rows are independent; stats partials are summed
    on the host), exactly what the topology wants.
    """

    def __init__(self, engine: DeviceEngine, mesh, *, axis: str = DATA_AXIS):
        self.engine = engine
        self.mesh = mesh
        self.axis = axis
        self.n_devices = mesh.devices.size
        self._jitted: dict[int, object] = {}
        self._sharded_tables = None
        self.stats = {"rows": 0, "fallback_docs": 0}

    # -- plumbing -----------------------------------------------------------

    def _tables(self):
        if self._sharded_tables is None:
            import jax

            rep = replicated(self.mesh, self.axis)
            host = self.engine._tables2()
            names = set(_TABLE_NAMES) | set(_TABLE_NAMES2)
            self._sharded_tables = {
                k: jax.tree.map(
                    lambda a: jax.device_put(np.asarray(a), rep), host[k]
                )
                for k in names
            }
        return self._sharded_tables

    def _tables2(self):
        return self._tables()

    def _program(self, KL: int):
        fn = self._jitted.get(KL)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        pipeline = self.engine.pipeline_fn(KL)
        axis = self.axis
        mesh = self.mesh
        rep = P()
        row2 = P(axis, None)
        row1 = P(axis)

        def per_shard(
            packed_trans, class_of, buckets, byte_to_rank,
            rows, n_payload, n_total,
        ):
            packed, counts, rounds, row_bad = pipeline(
                packed_trans, class_of, buckets, byte_to_rank,
                rows, n_payload, n_total,
            )
            # per-shard partial counters, summed on the host: the scan's
            # while_loop trip count is data-dependent, and a collective
            # behind imbalanced shards trips XLA's CPU rendezvous
            # stuck-detector under load (HARDWARE.md). Real-pod psum
            # stays demonstrated by the balanced train-step program
            # (parallel/train.corpus_pair_counts).
            local = jnp.stack(
                [
                    jnp.int32(rows.shape[0]),
                    jnp.sum(n_payload.astype(jnp.int32)),
                    jnp.sum(counts.astype(jnp.int32)),
                    jnp.sum(row_bad.astype(jnp.int32)),
                    rounds.astype(jnp.int32),
                ]
            )
            return packed, counts, row_bad, local[None]

        sharded = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(rep,) * 4 + (row2, row1, row1),
            out_specs=(row2, row1, row1, P(axis, None)),
            check_vma=False,
        )
        fn = jax.jit(sharded)
        self._jitted[KL] = fn
        return fn

    def _program2(self, C: int, KL: int):
        """Sharded v2 piece-slot pipeline: each chip tokenizes its row
        shard into a private flat token stream + header; streams stay
        sharded (one [t_cap] segment per chip), psum only for counters."""
        key = ("v2", C, KL)
        fn = self._jitted.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        pipeline = self.engine.pipeline2_fn(C, KL)
        axis = self.axis
        rep = P()
        row2 = P(axis, None)
        row1 = P(axis)

        def per_shard(
            scan_tables, buckets, byte_to_rank, vocab,
            rows, n_payload, n_total,
        ):
            flat, header = pipeline(
                scan_tables, buckets, byte_to_rank, vocab,
                rows, n_payload, n_total,
            )
            # per-shard partial counters, summed on the host: the forward
            # path stays collective-free (rows are independent), so no
            # shard ever waits on another — scan trip counts are
            # data-dependent and the XLA CPU rendezvous stuck-detector
            # fires on imbalanced shards if a psum is placed here.
            local = jnp.stack(
                [jnp.sum(n_payload.astype(jnp.int32)), header[-2]]
            )
            return flat, header, local

        sharded = jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(rep,) * 4 + (row2, row1, row1),
            out_specs=(row1, row1, row1),
            check_vma=False,
        )
        fn = jax.jit(sharded)
        self._jitted[key] = fn
        return fn

    def encode_rows_tokens(self, batch: PackedBatch, chunk_rows: int = 1024):
        """v2 sharded path: (row_tokens list, row_bad, CorpusStats-lite).

        Rows are dispatched in mesh-size x chunk_rows groups; each chip's
        flat stream is fetched and split per row on the host. Chunks that
        overflow a cap rerun through the engine's single-device v2 path
        (which itself falls back to v1 as needed)."""
        n_dev = self.n_devices
        B, KL = batch.rows.shape
        if B == 0:
            return [], np.zeros(0, bool)
        import jax

        tables = self._tables2()
        group = chunk_rows * n_dev
        fn = self._program2(chunk_rows, KL)
        shard2 = batch_sharded(self.mesh, self.axis, rank=2)
        shard1 = batch_sharded(self.mesh, self.axis, rank=1)

        row_tokens: list[np.ndarray] = []
        row_bad_all: list[np.ndarray] = []
        for lo in range(0, B, group):
            rows = batch.rows[lo : lo + group]
            n_payload = batch.n_payload[lo : lo + group]
            n_total = batch.n_total[lo : lo + group]
            n = rows.shape[0]
            if n < group:
                rows = np.concatenate([rows, np.zeros((group - n, KL), np.uint8)])
                n_payload = np.concatenate([n_payload, np.zeros(group - n, np.int32)])
                n_total = np.concatenate([n_total, np.zeros(group - n, np.int32)])
            flat, header, _totals = fn(
                *(tables[k] for k in _TABLE_NAMES2),
                jax.device_put(rows, shard2),
                jax.device_put(n_payload, shard1),
                jax.device_put(n_total, shard1),
            )
            flat = np.asarray(flat)
            header = np.asarray(header)
            t_cap = flat.shape[0] // n_dev
            hlen = header.shape[0] // n_dev
            for d in range(n_dev):
                hdr = header[d * hlen : (d + 1) * hlen]
                nrows = min(chunk_rows, max(0, n - d * chunk_rows))
                if nrows <= 0:
                    break
                if hdr[-1]:  # overflow: single-device v2/v1 fallback
                    sub = PackedBatch(
                        rows=batch.rows[lo + d * chunk_rows : lo + d * chunk_rows + nrows],
                        n_payload=batch.n_payload[lo + d * chunk_rows : lo + d * chunk_rows + nrows],
                        n_total=batch.n_total[lo + d * chunk_rows : lo + d * chunk_rows + nrows],
                        doc_index=batch.doc_index[lo + d * chunk_rows : lo + d * chunk_rows + nrows],
                        hard_cut_docs=frozenset(),
                        row_capacity=batch.row_capacity,
                    )
                    toks, bad = self.engine.encode_rows_tokens(sub)
                    row_tokens.extend(toks)
                    row_bad_all.append(bad)
                    continue
                counts = hdr[:nrows]
                offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
                seg = flat[d * t_cap : (d + 1) * t_cap]
                if self.engine.pack24:
                    from tiktoken_tpu.ops.engine import unpack_tokens24

                    seg = unpack_tokens24(
                        np.ascontiguousarray(seg), int(hdr[-2])
                    )
                for r in range(nrows):
                    row_tokens.append(seg[offs[r] : offs[r + 1]].astype(np.uint32))
                row_bad_all.append(hdr[chunk_rows : chunk_rows + nrows].astype(bool))
        self.stats["rows"] += B
        return row_tokens, np.concatenate(row_bad_all)

    def _program3(self, C: int, K: int, worst_case: bool = False):
        """Sharded v3 handshake pipeline: each chip tokenizes its own
        self-contained chunk (ghost row included), so the forward pass
        needs no collectives at all. ``worst_case`` compiles the
        densest-legal-input cap variant used for overflow retries."""
        key = ("v3", C, K, worst_case)
        fn = self._jitted.get(key)
        if fn is not None:
            return fn
        import jax
        from jax.sharding import PartitionSpec as P

        from tiktoken_tpu.ops.pipeline3 import build_pipeline3_fn, row_geometry

        KP, KL = row_geometry(K)
        S = -(-(C * KP + KL + 8) // 128) * 128
        pipeline = build_pipeline3_fn(
            K=K, C=C, flat_size=S,
            char_tables=self.engine.char_tables,
            pair_seed=self.engine.pair_table.seed,
            pair_buckets=self.engine.pair_table.n_buckets,
            vocab_seed=self.engine.vocab_table.seed,
            vocab_buckets=self.engine.vocab_table.n_buckets,
            long_seed=self.engine.long_vocab_table.seed,
            long_buckets=self.engine.long_vocab_table.n_buckets,
            pack24=self.engine.pack24,
            worst_case=worst_case,
        )
        rep = P()
        dat = P(self.axis)

        def per_shard(scan_tables, buckets, byte_to_rank, vocab, *chunk):
            chunk = tuple(c[0] for c in chunk)  # strip the shard axis
            flat, header = pipeline(
                scan_tables, buckets, byte_to_rank, vocab, *chunk
            )
            return flat[None], header[None]

        sharded = jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(rep,) * 4 + (dat,) * 7,
            out_specs=(dat, dat),
            check_vma=False,
        )
        fn = jax.jit(sharded)
        self._jitted[key] = fn
        return fn

    def encode_corpus3(
        self,
        texts: Sequence[str | bytes],
        host_fallback=None,
        K: int | None = None,
        chunk_rows: int = 1024,
    ) -> list[list[int]]:
        """Handshake-packed encode across the mesh: one self-contained
        chunk per device per dispatch; byte-exact with encode_ordinary."""
        import jax
        import numpy as np

        from tiktoken_tpu.ops.engine import unpack_tokens24
        from tiktoken_tpu.ops.pipeline3 import (
            K_DEFAULT,
            chunk_inputs3,
            pack_corpus3,
            row_geometry,
        )

        if K and K > 256:
            import warnings

            warnings.warn(
                f"row_capacity={K} capped to 256 on the device pipeline "
                "(scan cost grows superlinearly with row length)",
                stacklevel=3,
            )
        K = min(K or K_DEFAULT, 256)  # packing hint; large K compiles poorly
        docs = [t.encode("utf-8") if isinstance(t, str) else bytes(t) for t in texts]
        out: list[list[int]] = [[] for _ in docs]
        pc = pack_corpus3(docs, K)
        B = pc.row_off.shape[0]
        if B == 0:
            return out
        n_dev = self.n_devices
        per_dev = -(-B // n_dev)
        from tiktoken_tpu.ops.engine import quantize_chunk_rows

        chunk_rows = quantize_chunk_rows(per_dev + 1, chunk_rows)
        R = max(1, chunk_rows - 1)
        C = R + 1
        KP, KL = row_geometry(K)
        S = -(-(C * KP + KL + 8) // 128) * 128
        fn = self._program3(C, K)
        tables = self._tables2()
        shard1 = batch_sharded(self.mesh, self.axis, rank=2)

        frags: dict[int, list[np.ndarray]] = {}
        fallback_docs: set[int] = set()

        def build_group(g_lo):
            chunks = []
            nreals = []
            for d in range(n_dev):
                lo = g_lo + d * R
                inputs, nreal = chunk_inputs3(
                    pc, min(lo, B - 1), R if lo < B else 0, C, S
                )
                chunks.append(inputs)
                nreals.append(nreal if lo < B else 0)
            stacked = [
                jax.device_put(np.stack([c[i] for c in chunks]), shard1)
                for i in range(7)
            ]
            return stacked, nreals

        # threaded pre-upload, one group ahead (HARDWARE.md: overlapped
        # host->device streams run ~2x a single stream on the tunnel)
        from concurrent.futures import ThreadPoolExecutor

        g_los = list(range(0, B, R * n_dev))
        # first group built on the main thread: a cache-miss compile of
        # the sharded program must not overlap pool-thread device_puts
        # (XLA:CPU backend_compile races concurrent transfers — segfaults)
        first = build_group(g_los[0])
        first_out = fn(
            tables["scan2"], tables["buckets"], tables["byte_to_rank"],
            tables["vocab"], *first[0],
        )
        upool = ThreadPoolExecutor(max_workers=4)
        futs = {
            g: upool.submit(build_group, g) for g in g_los[1:3]
        }
        for gi, g_lo in enumerate(g_los):
            stacked, nreals = first if gi == 0 else futs.pop(g_lo).result()
            if gi + 3 < len(g_los):
                futs[g_los[gi + 3]] = upool.submit(build_group, g_los[gi + 3])
            flat, header = first_out if gi == 0 else fn(
                tables["scan2"], tables["buckets"], tables["byte_to_rank"],
                tables["vocab"], *stacked,
            )
            header = np.asarray(header)
            if header[:, -1].any():
                # cap overflow on some chip: re-dispatch the group through
                # the worst-case-caps variant (compiled lazily; by
                # construction it cannot overflow) — same behaviour as the
                # single-device path, so dense scripts stay on device.
                # Drain in-flight uploads first: the lazy compile must not
                # overlap pool-thread device_puts (XLA:CPU compile race).
                for f in futs.values():
                    f.result()
                wfn = self._program3(C, K, worst_case=True)
                flat, header = wfn(
                    tables["scan2"], tables["buckets"], tables["byte_to_rank"],
                    tables["vocab"], *stacked,
                )
                header = np.asarray(header)
            flat = np.asarray(flat)
            for d in range(n_dev):
                nreal = nreals[d]
                if nreal <= 0:
                    continue
                lo = g_lo + d * R
                hdr = header[d]
                counts = hdr[:C][1 : nreal + 1].astype(np.int64)
                bad = hdr[C : 2 * C][1 : nreal + 1].astype(bool)
                di = pc.doc_index[lo : lo + nreal]
                nt = int(hdr[-2])
                if hdr[-1]:
                    for doc in np.unique(di):
                        fallback_docs.add(int(doc))
                    continue
                toks = flat[d]
                if self.engine.pack24:
                    toks = unpack_tokens24(np.ascontiguousarray(toks), nt)
                else:
                    toks = toks[:nt]
                for doc in np.unique(di[bad]):
                    fallback_docs.add(int(doc))
                offs = np.concatenate([[0], np.cumsum(counts)])
                changes = np.nonzero(np.diff(di))[0] + 1
                fr_start = np.concatenate([[0], changes])
                fr_end = np.concatenate([changes, [nreal]])
                for a, b in zip(fr_start, fr_end):
                    doc = int(di[a])
                    frags.setdefault(doc, []).append(toks[offs[a] : offs[b]])
        upool.shutdown(wait=False)
        for doc, parts in frags.items():
            if doc in fallback_docs:
                continue
            out[doc] = (
                parts[0] if len(parts) == 1 else np.concatenate(parts)
            ).tolist()
        self.stats["rows"] += B
        if fallback_docs:
            self.stats["fallback_docs"] += len(fallback_docs)
            if host_fallback is None:
                raise ValueError(
                    f"{len(fallback_docs)} documents need host fallback but none given"
                )
            for d_i in fallback_docs:
                out[d_i] = host_fallback.encode_ordinary(docs[d_i].decode("utf-8"))
        return out

    def warmup(self, K: int | None = None, chunk_rows: int = 1024) -> None:
        """Pre-compile the sharded v3 program at its canonical geometry
        (one empty chunk per device). Mirrors DeviceEngine.warmup."""
        import jax
        import numpy as np

        from tiktoken_tpu.ops.engine import quantize_chunk_rows
        from tiktoken_tpu.ops.pipeline3 import K_DEFAULT, row_geometry

        K = min(K or K_DEFAULT, 256)
        C = quantize_chunk_rows(chunk_rows, chunk_rows)
        KP, KL = row_geometry(K)
        S = -(-(C * KP + KL + 8) // 128) * 128
        fn = self._program3(C, K)
        tables = self._tables2()
        n = self.n_devices
        shard = batch_sharded(self.mesh, self.axis, rank=2)
        i32 = np.zeros((n, C), np.int32)
        b1 = np.zeros((n, C), bool)
        chunk = (np.zeros((n, S), np.uint8), i32, i32, i32, b1, b1, b1)
        out = fn(
            tables["scan2"], tables["buckets"], tables["byte_to_rank"],
            tables["vocab"], *(jax.device_put(c, shard) for c in chunk),
        )
        np.asarray(out[1])

    # -- public ---------------------------------------------------------

    def pad_batch(self, batch: PackedBatch) -> PackedBatch:
        """Pad the row count to a multiple of the mesh size (empty rows)."""
        B = batch.rows.shape[0]
        n = self.n_devices
        pad = (-B) % n
        if pad == 0:
            return batch
        KL = batch.rows.shape[1]
        return PackedBatch(
            rows=np.concatenate(
                [batch.rows, np.zeros((pad, KL), dtype=np.uint8)]
            ),
            n_payload=np.concatenate(
                [batch.n_payload, np.zeros(pad, dtype=np.int32)]
            ),
            n_total=np.concatenate([batch.n_total, np.zeros(pad, dtype=np.int32)]),
            doc_index=np.concatenate(
                [batch.doc_index, np.full(pad, -1, dtype=np.int32)]
            ),
            hard_cut_docs=batch.hard_cut_docs,
            row_capacity=batch.row_capacity,
        )

    def encode_rows(self, batch: PackedBatch):
        """Run the sharded pipeline. Returns (packed, counts, row_bad,
        CorpusStats) as host values; padding rows are stripped."""
        import jax

        B0 = batch.rows.shape[0]
        batch = self.pad_batch(batch)
        tables = self._tables()
        KL = batch.rows.shape[1]
        fn = self._program(KL)

        shard2 = batch_sharded(self.mesh, self.axis, rank=2)
        shard1 = batch_sharded(self.mesh, self.axis, rank=1)
        rows = jax.device_put(batch.rows, shard2)
        n_payload = jax.device_put(batch.n_payload, shard1)
        n_total = jax.device_put(batch.n_total, shard1)

        packed, counts, row_bad, totals = fn(
            *(tables[k] for k in _TABLE_NAMES), rows, n_payload, n_total
        )
        totals = np.asarray(totals).sum(axis=0)  # host-reduced shard partials
        stats = CorpusStats(
            rows=int(totals[0]),
            payload_bytes=int(totals[1]),
            tokens=int(totals[2]),
            fallback_rows=int(totals[3]),
            merge_rounds=int(totals[4]),
        )
        self.stats["rows"] += B0
        return (
            np.asarray(packed)[:B0],
            np.asarray(counts)[:B0],
            np.asarray(row_bad)[:B0],
            stats,
        )

    def encode_corpus(
        self,
        texts: Sequence[str | bytes],
        host_fallback=None,
        row_capacity: int | None = None,
    ) -> list[list[int]]:
        """Encode documents across the mesh; byte-exact with
        ``encode_ordinary``. Mirrors DeviceEngine.encode_corpus. Routes
        through the v3 handshake pipeline when char tables are enabled."""
        import os

        if (
            self.engine.char_tables is not None
            and os.environ.get("TIKTOKEN_TPU_PIPELINE", "3") != "2"
        ):
            return self.encode_corpus3(
                texts, host_fallback=host_fallback, K=row_capacity
            )
        row_capacity = row_capacity or batch_default_row()
        docs = [t.encode("utf-8") if isinstance(t, str) else bytes(t) for t in texts]
        batch = pack_documents(docs, row_capacity)
        out: list[list[int]] = [[] for _ in docs]
        if batch.rows.shape[0] == 0:
            return out
        row_tokens, row_bad = self.encode_rows_tokens(batch)
        fallback_docs = set(batch.hard_cut_docs)
        for row in np.nonzero(row_bad)[0]:
            fallback_docs.add(int(batch.doc_index[row]))
        for row, toks in enumerate(row_tokens):
            d = int(batch.doc_index[row])
            if d < 0 or d in fallback_docs:
                continue
            out[d].extend(toks.tolist())
        if fallback_docs:
            self.stats["fallback_docs"] += len(fallback_docs)
            if host_fallback is None:
                raise ValueError(
                    f"{len(fallback_docs)} documents need host fallback but none given"
                )
            for d in fallback_docs:
                out[d] = host_fallback.encode_ordinary(docs[d].decode("utf-8"))
        return out


def batch_default_row() -> int:
    from tiktoken_tpu.ops.engine import DEFAULT_ROW

    return DEFAULT_ROW
