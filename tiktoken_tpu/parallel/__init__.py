"""Multi-chip / multi-host parallelism: mesh construction, sharded corpus
encoding, and distributed training primitives.

The reference scales with GIL-released threads on one host (reference:
tiktoken/core.py:164-206); this package is the TPU-native replacement:
SPMD over a ``jax.sharding.Mesh`` with replicated compiled tables and
psum-reduced counters.
"""

from tiktoken_tpu.parallel.mesh import DATA_AXIS, batch_sharded, data_mesh, replicated
from tiktoken_tpu.parallel.encode import CorpusStats, ShardedEngine
from tiktoken_tpu.parallel.stream import StreamEncoder
from tiktoken_tpu.parallel.train import corpus_pair_counts, make_pair_count_step

__all__ = [
    "DATA_AXIS",
    "CorpusStats",
    "ShardedEngine",
    "StreamEncoder",
    "batch_sharded",
    "corpus_pair_counts",
    "data_mesh",
    "make_pair_count_step",
    "replicated",
]
