"""Scaling-efficiency measurement: bytes/s on 1 vs N virtual devices.

Reproduces the reference benchmark methodology (one warmup, then
perf_counter around the batch encode; reference: scripts/benchmark.py:15-37)
over the sharded engine on an N-device mesh. Absolute CPU-backend MB/s is
not meaningful; the tracked number is the 1->N scaling ratio (north star:
>= 90% at N=8). Writes one JSON line to stdout.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/bench_scaling.py [N] [MB]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
MB = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0

os.environ["JAX_PLATFORMS"] = "cpu"  # this harness measures the CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}"
    ).strip()

# a sitecustomize may have imported jax already (pinning another
# platform); override before any backend initializes
import sys as _sys  # noqa: E402

if "jax" in _sys.modules:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


def run(mesh_devices, docs, enc):
    import numpy as np
    from jax.sharding import Mesh

    from tiktoken_tpu.parallel import ShardedEngine

    mesh = Mesh(np.asarray(mesh_devices), ("data",))
    se = ShardedEngine(enc.device_engine, mesh)
    nbytes = sum(len(d) for d in docs)
    _ = se.encode_corpus([docs[0][:20000]], host_fallback=enc)  # warmup/compile
    t0 = time.perf_counter()
    _ = se.encode_corpus(docs, host_fallback=enc)
    dt = time.perf_counter() - t0
    return nbytes / dt / 1e6


def main():
    import jax

    from tests.helpers import make_encoding, make_mixed_corpus

    devs = jax.devices()
    assert len(devs) >= N_DEV, f"need {N_DEV} devices, have {len(devs)}"
    enc = make_encoding("o200k", 2000)
    chunk = make_mixed_corpus(250_000, seed=3).encode()
    n = int(MB * 1e6)
    docs = []
    while sum(len(d) for d in docs) < n:
        docs.append(chunk)

    one = run(devs[:1], docs, enc)
    many = run(devs[:N_DEV], docs, enc)
    eff = many / (one * N_DEV)
    print(
        json.dumps(
            {
                "metric": f"sharded encode scaling 1->{N_DEV} virtual devices",
                "mbs_1dev": round(one, 2),
                f"mbs_{N_DEV}dev": round(many, 2),
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
