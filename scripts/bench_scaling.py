"""Scaling-efficiency measurement: the sharded v3 device program on 1 vs
N virtual devices.

Times the jitted SPMD program itself (per-device self-contained chunks;
no collectives in the forward pass), so the number isolates the sharding
design rather than host-side assembly. Absolute CPU-backend MB/s is not
meaningful; the tracked number is the 1->N ratio (north star: >= 90% at
N=8 — trivially reachable here because shards share nothing, which is
the point of the design).

Usage: python scripts/bench_scaling.py [N] [CHUNK_ROWS]
Writes one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
CHUNK_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 512

os.environ["JAX_PLATFORMS"] = "cpu"  # this harness measures the CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}"
    ).strip()

import sys as _sys  # noqa: E402

if "jax" in _sys.modules:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


def measure(se, pc, n_dev, C, K, S, R):
    """Returns (MB/s, best wall seconds) for one dispatch over the mesh."""
    import jax
    import numpy as np

    from tiktoken_tpu.ops.pipeline3 import chunk_inputs3
    from tiktoken_tpu.parallel.mesh import batch_sharded

    fn = se._program3(C, K)
    tables = se._tables2()
    shard = batch_sharded(se.mesh, se.axis, rank=2)
    B = pc.row_off.shape[0]
    chunks, payload = [], 0
    for d in range(n_dev):
        lo = (d * R) % max(1, B - R)
        inputs, nreal = chunk_inputs3(pc, lo, R, C, S)
        payload += int(inputs[2].sum())
        chunks.append(inputs)
    stacked = [
        jax.device_put(np.stack([c[i] for c in chunks]), shard)
        for i in range(7)
    ]

    def once():
        flat, header = fn(
            tables["scan2"], tables["buckets"], tables["byte_to_rank"],
            tables["vocab"], *stacked,
        )
        np.asarray(header)

    once()  # compile + warmup
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        once()
        best = min(best, time.perf_counter() - t0)
    return payload / best / 1e6, best


def main():
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from tests.helpers import make_encoding, make_mixed_corpus
    from tiktoken_tpu.ops.pipeline3 import pack_corpus3, row_geometry
    from tiktoken_tpu.parallel import ShardedEngine

    devs = jax.devices()
    assert len(devs) >= N_DEV, f"need {N_DEV} devices, have {len(devs)}"
    enc = make_encoding("o200k", 2000)
    K = 96
    KP, KL = row_geometry(K)
    R = CHUNK_ROWS - 1
    C = R + 1
    S = -(-(C * KP + KL + 8) // 128) * 128
    docs = [make_mixed_corpus(300_000, seed=s).encode() for s in range(3)]
    pc = pack_corpus3(docs, K)

    se1 = ShardedEngine(enc.device_engine, Mesh(np.asarray(devs[:1]), ("data",)))
    one, t1 = measure(se1, pc, 1, C, K, S, R)
    seN = ShardedEngine(enc.device_engine, Mesh(np.asarray(devs[:N_DEV]), ("data",)))
    many, tN = measure(seN, pc, N_DEV, C, K, S, R)
    eff = many / (one * N_DEV)
    cores = os.cpu_count() or 1
    # With fewer host cores than virtual devices the CPU backend
    # SERIALIZES shards, so the throughput ratio is bounded by
    # cores/N regardless of the sharding design. The design claim that
    # survives serialization is per-shard overhead: N shards must cost
    # no more than N times one shard (the forward pass shares nothing).
    overhead = tN / (N_DEV * t1)
    print(
        json.dumps(
            {
                "metric": f"sharded v3 program scaling 1->{N_DEV} virtual devices",
                "mbs_1dev": round(one, 2),
                f"mbs_{N_DEV}dev": round(many, 2),
                "scaling_efficiency": round(eff, 3),
                "host_cores": cores,
                "serialized": cores < N_DEV,
                "per_shard_overhead": round(overhead, 3),
                "note": (
                    "scaling_efficiency is the wall-clock throughput ratio; "
                    "with host_cores < N the CPU mesh serializes and "
                    "cores/N bounds it — per_shard_overhead (~1.0 = no "
                    "sharding overhead) is the design property then"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
