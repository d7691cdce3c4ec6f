"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The reference never tests distribution (it has none; reference:
tiktoken/core.py:164-206 is thread-level only). Here the sharded engine
must be byte-exact with the host oracle, stats must psum correctly, and
the distributed pair-count training step must agree with a numpy count.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.helpers import make_mixed_corpus, make_encoding, make_oracle


@pytest.fixture(scope="module")
def mesh():
    from tiktoken_tpu.parallel import data_mesh

    return data_mesh()


@pytest.fixture(scope="module")
def enc():
    return make_encoding("o200k")


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


def test_sharded_encode_matches_oracle(mesh, enc):
    from tiktoken_tpu.parallel import ShardedEngine

    sharded = ShardedEngine(enc.device_engine, mesh)
    oracle = make_oracle("o200k")
    docs = [
        make_mixed_corpus(1500, seed=s) for s in range(5)
    ] + ["", "x", "hello world", "a\nb\r\nc  d"]
    # one shared row geometry across this module's sharded tests: each
    # distinct row_capacity compiles its own per-shard program (minutes
    # on the 1-core XLA:CPU box)
    got = sharded.encode_corpus(docs, host_fallback=enc, row_capacity=128)
    for d, g in zip(docs, got):
        assert g == oracle.encode_ordinary(d), d[:50]


def test_sharded_stats_psum(mesh, enc):
    from tiktoken_tpu.ops.engine import pack_documents
    from tiktoken_tpu.parallel import ShardedEngine

    sharded = ShardedEngine(enc.device_engine, mesh)
    docs = [make_mixed_corpus(3000, seed=s).encode() for s in range(3)]
    batch = pack_documents(docs, 512)
    packed, counts, row_bad, stats = sharded.encode_rows(batch)
    assert stats.payload_bytes == sum(len(d) for d in docs)
    assert stats.tokens == int(counts.sum())
    assert stats.rows % 8 == 0  # padded row count
    assert stats.fallback_rows == int(row_bad.sum())


def test_uneven_batch_padding(mesh, enc):
    """Row counts not divisible by the mesh size must still be exact."""
    from tiktoken_tpu.parallel import ShardedEngine

    sharded = ShardedEngine(enc.device_engine, mesh)
    oracle = make_oracle("o200k")
    doc = make_mixed_corpus(700, seed=9)
    got = sharded.encode_corpus([doc], host_fallback=enc, row_capacity=128)
    assert got == [oracle.encode_ordinary(doc)]


def test_pair_count_step_matches_numpy(mesh):
    from tiktoken_tpu.parallel import corpus_pair_counts
    from tiktoken_tpu.parallel.train import _pair_hash

    rng = np.random.default_rng(0)
    B, K = 16, 64
    tokens = rng.integers(0, 500, size=(B, K)).astype(np.uint32)
    alive = rng.random((B, K)) < 0.7
    piece_start = rng.random((B, K)) < 0.15
    piece_start[:, 0] = True

    hist, best_bin, best_count = corpus_pair_counts(
        mesh, tokens, alive, piece_start, hist_bits=12
    )

    # numpy reference: adjacent alive columns within a piece
    import jax.numpy as jnp

    want = np.zeros(1 << 12, dtype=np.int64)
    for b in range(B):
        cols = [k for k in range(K) if alive[b, k]]
        for i, k in enumerate(cols[:-1]):
            j = cols[i + 1]
            if piece_start[b, j]:
                continue
            h = int(np.asarray(_pair_hash(jnp.uint32(tokens[b, k]), jnp.uint32(tokens[b, j]), 12)))
            want[h] += 1
    assert hist.sum() == want.sum()
    np.testing.assert_array_equal(hist, want)
    assert best_count == want.max()


def test_graft_entry_single_chip():
    import jax

    import __graft_entry__ as graft

    fn, args = graft.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    # v3 contract: (flat_tokens, header = [row_counts | row_bad |
    # n_tokens | overflow])
    tok, header = compiled(*args)
    header = np.asarray(header)
    n_tokens, overflow = int(header[-2]), int(header[-1])
    assert overflow == 0
    assert n_tokens > 0


def test_graft_dryrun_multichip():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_stream_encoder_checkpoint_resume(tmp_path, enc):
    from tiktoken_tpu.parallel.stream import StreamEncoder

    docs = [make_mixed_corpus(400, seed=s) for s in range(10)]
    se = StreamEncoder(enc, str(tmp_path), shard_docs=3)
    totals = se.encode_corpus(docs, strategy="host")
    assert totals["shards"] == 4 and totals["resumed"] == 0
    want_tokens = sum(len(enc.encode_ordinary(d)) for d in docs)
    assert totals["tokens"] == want_tokens

    # resume: a fresh encoder over the same dir skips all completed shards
    se2 = StreamEncoder(enc, str(tmp_path), shard_docs=3)
    totals2 = se2.encode_corpus(docs, strategy="host")
    assert totals2["resumed"] == 4
    assert totals2["tokens"] == want_tokens

    # shard contents round-trip per document
    flat, offs = se2.read_shard(1)
    for j, d in enumerate(docs[3:6]):
        assert flat[offs[j]:offs[j+1]].tolist() == enc.encode_ordinary(d)

    # partial manifest (simulated crash): only the surviving shard resumes
    import os
    os.remove(str(tmp_path / "shard_000002.npy"))
    se3 = StreamEncoder(enc, str(tmp_path), shard_docs=3)
    totals3 = se3.encode_corpus(docs, strategy="host")
    assert totals3["resumed"] == 3
    assert totals3["tokens"] == want_tokens
