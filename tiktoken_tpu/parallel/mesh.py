"""Device-mesh construction for multi-chip / multi-host tokenization.

The reference's entire scaling story is GIL-released threads on one host
(reference: tiktoken/core.py:164-206, src/py.rs:31). The TPU-native
equivalent is a 1-D data mesh over all chips of a slice (or pod): the
corpus batch axis is sharded over the mesh, the compiled tables (scanner
DFA, pair table — a few MB) are replicated per chip, and reductions
(token/byte counters, pair histograms for training) ride ICI via psum.
"""

from __future__ import annotations

DATA_AXIS = "data"


def data_mesh(n_devices: int | None = None, *, axis: str = DATA_AXIS):
    """A 1-D mesh over the first ``n_devices`` local devices (all, if None).

    For multi-host pods, call ``jax.distributed.initialize()`` first and
    pass ``jax.devices()`` — the mesh spans every chip in the job.
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicated(mesh, axis: str = DATA_AXIS):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def batch_sharded(mesh, axis: str = DATA_AXIS, rank: int = 2):
    """NamedSharding splitting the leading (batch) dim over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(axis, *([None] * (rank - 1))))
