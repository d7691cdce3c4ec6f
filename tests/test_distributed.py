"""Multi-PROCESS distribution: two OS processes form a jax.distributed
cluster (CPU backend), build a global 2-device mesh, and psum corpus
stats across process boundaries — the path parallel/mesh.py documents
but the virtual single-process mesh cannot exercise."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)  # one local device per process
    import jax
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    devs = np.asarray(jax.devices())  # 2 global devices, 1 local
    assert devs.size == 2
    mesh = Mesh(devs, ("data",))

    # per-process corpus shard -> global array -> psum'd stats
    local = np.full((4, 8), pid + 1, dtype=np.int32)
    arr = jax.make_array_from_process_local_data(
        jax.NamedSharding(mesh, P("data", None)), local, (8, 8)
    )

    def stats(x):
        return jax.lax.psum(x.sum(), "data")

    out = jax.jit(
        jax.shard_map(stats, mesh=mesh, in_specs=P("data", None), out_specs=P())
    )(arr)
    total = int(np.asarray(out.addressable_data(0)))
    want = 4 * 8 * 1 + 4 * 8 * 2
    assert total == want, (total, want)
    print(f"proc {pid}: psum ok ({total})")
    """
)


@pytest.mark.timeout(240)
def test_two_process_psum(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    # a clean env: the axon sitecustomize (PYTHONPATH) imports jax and
    # initializes backends before jax.distributed.initialize could run
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "PYTHONPATH", "JAX_PLATFORMS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=220)
        outs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i][-2000:]}"
        assert "psum ok" in outs[i]
