"""First-class observability: device traces and engine counters.

The reference keeps its performance knowledge in comments and an offline
benchmark script (reference: src/lib.rs:221-260, scripts/benchmark.py);
here profiling is part of the library: wrap any region in
:func:`device_trace` to capture a ``jax.profiler`` trace viewable in
TensorBoard/Perfetto, and :func:`engine_report` snapshots every engine's
counters (rows, fallbacks, throughput) for one Encoding.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Tiny wall-clock byte-rate meter for encode loops."""

    def __init__(self) -> None:
        self.bytes = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def measure(self, n_bytes: int) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds += time.perf_counter() - t0
            self.bytes += n_bytes

    @property
    def mb_per_s(self) -> float:
        return self.bytes / self.seconds / 1e6 if self.seconds else 0.0


def engine_report(encoding) -> dict:
    """Counters for every engine an Encoding has instantiated so far."""
    report: dict = {"name": encoding.name}
    core = getattr(encoding, "_core_bpe", None)
    if core is not None:
        native = core._native
        report["host_native"] = (
            "unavailable" if native is False else
            "not built yet" if native is None else "active"
        )
    dev = getattr(encoding, "_device_engine", None)
    if dev is not None:
        report["device"] = dict(dev.stats)
        report["device_tables"] = {
            "dfa_states": dev.dfa.n_states,
            "dfa_classes": dev.dfa.n_classes,
            "pair_buckets": dev.pair_table.n_buckets,
            "pair_entries": dev.pair_table.n_pairs,
            "vocab_buckets": dev.vocab_table.n_buckets if dev.vocab_table else 0,
        }
    return report
