"""Corpus-scale streaming encoder with checkpoint/resume.

The reference has no persistent-progress story (it is a library call); at
corpus scale (the 100GB configuration in SURVEY.md §5) interruption
tolerance is mandatory. This encoder processes a corpus as numbered
shards, writes each shard's tokens and a manifest entry atomically, and
on restart skips shards the manifest already records — the same
atomic-write + verify-on-reuse discipline as the reference's download
cache (reference: tiktoken/load.py:54-86).

Output layout (one directory per run):
    manifest.jsonl   one line per completed shard: index, byte/token
                     counts, engine used, document token offsets
    shard_{i:06d}.npy  uint32 token stream for the shard's documents
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Iterable, Iterator, Sequence

import numpy as np


def _iter_shards(docs: Iterable[str], shard_docs: int) -> Iterator[list[str]]:
    buf: list[str] = []
    for d in docs:
        buf.append(d)
        if len(buf) >= shard_docs:
            yield buf
            buf = []
    if buf:
        yield buf


def _atomic_write(path: str, write_fn) -> None:
    tmp = f"{path}.{uuid.uuid4()}.tmp"
    write_fn(tmp)
    os.replace(tmp, path)


class StreamEncoder:
    """Checkpointed corpus encoding over any Encoding."""

    def __init__(self, encoding, out_dir: str, *, shard_docs: int = 64):
        self.encoding = encoding
        self.out_dir = out_dir
        self.shard_docs = shard_docs
        os.makedirs(out_dir, exist_ok=True)
        self.manifest_path = os.path.join(out_dir, "manifest.jsonl")
        self._done: dict[int, dict] = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    try:
                        e = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn tail line from a crash: redo shard
                    if os.path.exists(self._shard_path(e["shard"])):
                        self._done[e["shard"]] = e

    def _shard_path(self, i: int) -> str:
        return os.path.join(self.out_dir, f"shard_{i:06d}.npy")

    def encode_corpus(
        self, docs: Iterable[str], *, strategy: str = "hybrid", progress=None
    ) -> dict:
        """Encode all documents, resuming past completed shards. Returns
        run totals: shards, documents, bytes, tokens, skipped (resumed)."""
        totals = {"shards": 0, "documents": 0, "bytes": 0, "tokens": 0,
                  "resumed": 0, "seconds": 0.0}
        mf = open(self.manifest_path, "a")
        try:
            for i, shard in enumerate(_iter_shards(docs, self.shard_docs)):
                totals["shards"] += 1
                totals["documents"] += len(shard)
                nbytes = sum(len(d.encode("utf-8")) for d in shard)
                totals["bytes"] += nbytes
                if i in self._done:
                    totals["resumed"] += 1
                    totals["tokens"] += self._done[i]["tokens"]
                    continue
                t0 = time.perf_counter()
                try:
                    toks = self.encoding.encode_corpus(shard, strategy=strategy)
                except Exception:
                    # shard retry on the host engine: never lose a shard to
                    # a device-side failure
                    toks = [self.encoding.encode_ordinary(d) for d in shard]
                dt = time.perf_counter() - t0
                offsets = np.cumsum([0] + [len(t) for t in toks]).tolist()
                flat = np.concatenate(
                    [np.asarray(t, dtype=np.uint32) for t in toks]
                ) if any(len(t) for t in toks) else np.zeros(0, np.uint32)
                _atomic_write(self._shard_path(i), lambda p: self._save(p, flat))
                entry = {
                    "shard": i, "documents": len(shard), "bytes": nbytes,
                    "tokens": int(offsets[-1]), "doc_offsets": offsets,
                    "seconds": round(dt, 3),
                }
                mf.write(json.dumps(entry) + "\n")
                mf.flush()
                os.fsync(mf.fileno())
                totals["tokens"] += entry["tokens"]
                totals["seconds"] += dt
                if progress is not None:
                    progress(entry)
        finally:
            mf.close()
        return totals

    @staticmethod
    def _save(path: str, arr: np.ndarray) -> None:
        with open(path, "wb") as f:
            np.save(f, arr)

    def read_shard(self, i: int) -> tuple[np.ndarray, list[int]]:
        """(flat tokens, per-document offsets) of a completed shard."""
        if i not in self._done:
            with open(self.manifest_path) as f:
                for line in f:
                    e = json.loads(line)
                    if e["shard"] == i:
                        self._done[i] = e
        e = self._done[i]
        return np.load(self._shard_path(i)), e["doc_offsets"]
