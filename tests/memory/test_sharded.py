"""Sharded memory engine tests on the virtual 8-device CPU mesh —
the multi-chip retrieval path (per-shard top-k + all_gather merge)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from aura_snn_rag_tpu.config import MemoryConfig
from aura_snn_rag_tpu.memory.sharded import (
    decay_memories_sharded, init_sharded_memory, rebuild_centroids_sharded,
    retrieve_sharded, write_memories_sharded)


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:4]).reshape(4, 1)
    return Mesh(devs, ("data", "model"))


def cfg():
    return MemoryConfig(max_memories=64, feature_dim=16, k_centroids=4,
                        probe_centroids=2, n_place_cells=8, n_grid_cells=4,
                        n_time_cells=4)


class TestShardedMemory:
    def test_write_and_retrieve_across_shards(self, mesh):
        c = cfg()
        state = init_sharded_memory(c, mesh)
        rng = np.random.RandomState(0)
        # 16 rows → 4 per shard; distinct values
        feats = np.eye(16, dtype=np.float32)
        feats = np.repeat(feats, 1, axis=0)[:16]
        state = write_memories_sharded(
            c, mesh, state, jnp.asarray(feats), jnp.zeros((16, 2)))
        counts = np.asarray(state.count)
        assert counts.shape == (4,)
        assert (counts == 4).all()

        # query for a specific row living on shard 2 (rows 8..11)
        q = jnp.asarray(feats[9:10])
        res = retrieve_sharded(c, mesh, state, q, k=3)
        assert res.indices.shape == (1, 3)
        top = int(res.indices[0, 0])
        shard, local = divmod(top, c.max_memories)
        # global slot maps back to the right stored vector
        np.testing.assert_allclose(
            np.asarray(res.features[0, 0]), feats[9], rtol=1e-5)

    def test_rebuild_and_indexed_retrieval(self, mesh):
        c = cfg()
        state = init_sharded_memory(c, mesh)
        rng = np.random.RandomState(1)
        centers = rng.randn(8, 16).astype(np.float32) * 3
        feats = (centers[rng.randint(0, 8, 64)]
                 + 0.1 * rng.randn(64, 16)).astype(np.float32)
        state = write_memories_sharded(
            c, mesh, state, jnp.asarray(feats), jnp.zeros((64, 2)))
        state = rebuild_centroids_sharded(c, mesh, state,
                                          jax.random.PRNGKey(0))
        assert np.asarray(state.index_ready).all()

        q = jnp.asarray(feats[:4] + 0.01 * rng.randn(4, 16).astype(np.float32))
        res = retrieve_sharded(c, mesh, state, q, k=5)
        # nearest neighbor of each query is the original row
        for b in range(4):
            g = int(res.indices[b, 0])
            shard, local = divmod(g, c.max_memories)
            global_row = shard * 16 + local  # 16 rows written per shard
            assert global_row == b or \
                np.allclose(np.asarray(res.features[b, 0]), feats[b],
                            atol=0.2)

    def test_decay(self, mesh):
        c = cfg()
        state = init_sharded_memory(c, mesh)
        state = write_memories_sharded(
            c, mesh, state, jnp.ones((8, 16)), jnp.zeros((8, 2)))
        state = decay_memories_sharded(state, 0.5)
        s = np.asarray(state.strength)
        assert s.max() == pytest.approx(0.5)


class TestShardedDecayConsistency:
    """decay_memories_sharded must advance decay_accum alongside strength
    (ADVICE r1 medium): the IVF coarse path reconstructs strength as
    exp(decay_accum − cluster_decay), so the pair must stay in sync."""

    def test_decay_advances_accumulator(self, mesh):
        c = cfg()
        state = init_sharded_memory(c, mesh)
        rng = np.random.RandomState(1)
        feats = rng.randn(16, 16).astype(np.float32)
        state = write_memories_sharded(
            c, mesh, state, jnp.asarray(feats), jnp.zeros((16, 2)))
        accum_before = np.asarray(state.decay_accum)
        state = decay_memories_sharded(state, 0.25)
        accum_after = np.asarray(state.decay_accum)
        np.testing.assert_allclose(
            accum_after - accum_before, np.log(1.0 - 0.25), rtol=1e-6)

    def test_sharded_decay_matches_ivf_scores(self, mesh):
        """After sharded decay + per-shard rebuild, sharded IVF retrieval
        scores must match a brute-force single-bank computation."""
        from aura_snn_rag_tpu.memory import engine
        c = cfg()
        state = init_sharded_memory(c, mesh)
        rng = np.random.RandomState(2)
        feats = rng.randn(32, 16).astype(np.float32)
        state = write_memories_sharded(
            c, mesh, state, jnp.asarray(feats), jnp.zeros((32, 2)))
        state = decay_memories_sharded(state, 0.3)
        state = rebuild_centroids_sharded(
            c, mesh, state, jax.random.PRNGKey(0))

        q = jnp.asarray(feats[5:6] / np.linalg.norm(feats[5]))
        res = retrieve_sharded(c, mesh, state, q, k=3)

        # brute-force on shard 1's squeezed bank (rows 8..15 live there)
        shard, local = divmod(int(res.indices[0, 0]), c.max_memories)
        single = jax.tree.map(lambda x: x[shard], state)
        exact = engine.retrieve_bruteforce(c, single, q, None, 3)
        assert int(exact.indices[0, 0]) == local
        np.testing.assert_allclose(
            float(res.scores[0, 0]), float(exact.scores[0, 0]), rtol=1e-4)
