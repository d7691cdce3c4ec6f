"""Observability utilities."""

from __future__ import annotations

from tests.helpers import make_encoding


def test_engine_report_and_throughput():
    from tiktoken_tpu.utils.profiling import Throughput, engine_report

    enc = make_encoding("cl100k")
    _ = enc.encode_ordinary("warm up the host engine")
    _ = enc.encode_corpus(["device side too"], strategy="device")

    rep = engine_report(enc)
    assert rep["host_native"] in ("active", "unavailable", "not built yet")
    assert rep["device"]["rows"] >= 1
    assert rep["device_tables"]["dfa_states"] > 1

    meter = Throughput()
    with meter.measure(1000):
        _ = enc.encode_ordinary("x" * 1000)
    assert meter.bytes == 1000 and meter.mb_per_s > 0


def test_device_trace_produces_profile(tmp_path):
    """device_trace wraps jax.profiler: a trace directory with xplane
    artifacts must appear around a jitted computation."""
    import jax
    import jax.numpy as jnp

    from tiktoken_tpu.utils.profiling import device_trace

    log_dir = tmp_path / "trace"
    with device_trace(str(log_dir)):
        _ = jax.jit(lambda x: (x * 2 + 1).sum())(jnp.arange(1024)).block_until_ready()
    produced = list(log_dir.rglob("*"))
    assert any(p.is_file() for p in produced), produced
