"""Multi-slice (DCN×ICI) episodic bank: hierarchical retrieval merge.

8 virtual CPU devices as 2 "slices" × 2 data × 2 model. The bank shards
over ("replica", "data") — 4 shards; retrieval merges ICI-first then DCN.
No reference equivalent (single-device reference; SURVEY §2.8/§5.8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aura_snn_rag_tpu.config import MemoryConfig
from aura_snn_rag_tpu.memory.sharded import (
    init_sharded_memory, rebuild_centroids_sharded, retrieve_sharded,
    write_memories_sharded)
from aura_snn_rag_tpu.parallel.distributed import multislice_mesh

AXES = ("replica", "data")


@pytest.fixture(scope="module")
def mesh():
    return multislice_mesh(n_slices=2, n_model=2)


def cfg():
    return MemoryConfig(max_memories=64, feature_dim=16, k_centroids=4,
                        probe_centroids=2, n_place_cells=8, n_grid_cells=4,
                        n_time_cells=4)


def test_mesh_shape(mesh):
    assert dict(mesh.shape) == {"replica": 2, "data": 2, "model": 2}


def test_hierarchical_retrieval_matches_global_bruteforce(mesh):
    c = cfg()
    state = init_sharded_memory(c, mesh, axis=AXES)
    rng = np.random.RandomState(0)
    feats = rng.randn(32, 16).astype(np.float32)   # 8 rows per shard
    state = write_memories_sharded(
        c, mesh, state, jnp.asarray(feats), jnp.zeros((32, 2)), axis=AXES)
    assert np.asarray(state.count).shape == (4,)
    assert (np.asarray(state.count) == 8).all()

    q = jnp.asarray(feats[[3, 13, 22, 30]] +
                    0.01 * rng.randn(4, 16).astype(np.float32))
    res = retrieve_sharded(c, mesh, state, q, k=5, axis=AXES)

    # globalized slots map back to the original row order: the [S, ...]
    # stacking is outer-major (replica, data), and writes shard the batch
    # the same way, so row i lives at shard i//8, local slot i%8
    top = np.asarray(res.indices)[:, 0]
    got_rows = (top // c.max_memories) * 8 + (top % c.max_memories)
    np.testing.assert_array_equal(got_rows, [3, 13, 22, 30])

    # full ranking matches a single-bank exact scan (fresh bank: ranking
    # reduces to cosine, matching weights w_cosine·strength)
    fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    qn = np.asarray(q) / np.linalg.norm(np.asarray(q), axis=1, keepdims=True)
    cos = qn @ fn.T
    best = np.argsort(-cos, axis=1)[:, :5]
    approx_rows = ((np.asarray(res.indices) // c.max_memories) * 8
                   + np.asarray(res.indices) % c.max_memories)
    for b in range(4):
        assert set(approx_rows[b].tolist()) == set(best[b].tolist())


def test_indexed_multislice_retrieval(mesh):
    c = cfg()
    state = init_sharded_memory(c, mesh, axis=AXES)
    rng = np.random.RandomState(1)
    centers = rng.randn(8, 16).astype(np.float32) * 3
    feats = (centers[rng.randint(0, 8, 128)]
             + 0.1 * rng.randn(128, 16)).astype(np.float32)
    state = write_memories_sharded(
        c, mesh, state, jnp.asarray(feats), jnp.zeros((128, 2)), axis=AXES)
    state = rebuild_centroids_sharded(
        c, mesh, state, jax.random.PRNGKey(0), axis=AXES)
    q = jnp.asarray(feats[:3])
    res = retrieve_sharded(c, mesh, state, q, k=3, axis=AXES)
    rows = ((np.asarray(res.indices) // c.max_memories) * 32
            + np.asarray(res.indices) % c.max_memories)
    # self-retrieval wins
    np.testing.assert_array_equal(rows[:, 0], [0, 1, 2])
    assert np.isfinite(np.asarray(res.scores)).all()
