"""Episodic memory engine tests — semantics mirror of the reference's
tests/test_hippocampal_index.py (cluster purity / brute-force fallback /
decay) plus TPU-build-specific coverage: batched retrieval, FIFO overwrite
with generation-stamped stale-entry invalidation, recall vs brute force."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aura_snn_rag_tpu.config import MemoryConfig
from aura_snn_rag_tpu.memory import (
    HippocampalFormation, init_memory_state,
    write_memories, retrieve, retrieve_bruteforce, rebuild_centroids,
    decay_memories,
)
from aura_snn_rag_tpu.memory import engine


def small_cfg(**kw):
    base = dict(max_memories=128, feature_dim=4, k_centroids=4,
                rebuild_interval=1000, probe_centroids=2,
                n_place_cells=16, n_grid_cells=8, n_time_cells=4,
                bucket_overprovision=2.0)
    base.update(kw)
    return MemoryConfig(**base)


class TestCentroidIndex:
    def test_cluster_purity(self):
        """Two planted clusters → top-5 retrieval all from query's cluster
        (reference test_centroid_index_biases_retrieval)."""
        hf = HippocampalFormation(small_cfg(), seed=0)
        rng = np.random.RandomState(0)
        a = np.array([1.0, 0, 0, 0]) + 0.01 * rng.randn(10, 4)
        b = np.array([0, 1.0, 0, 0]) + 0.01 * rng.randn(10, 4)
        hf.write_batch([f"A{i}" for i in range(10)], a)
        hf.write_batch([f"B{i}" for i in range(10)], b)
        hf.rebuild_centroids()
        assert hf.index_ready
        assert hf.memory_count == 20

        results = hf.retrieve_similar_memories(
            np.array([1.0, 0, 0, 0]), k=5)
        assert len(results) == 5
        assert all(rid.startswith("A") for rid, _ in results)

    def test_bruteforce_fallback_small_bank(self):
        """count < k_centroids → brute-force path still retrieves."""
        hf = HippocampalFormation(small_cfg(), seed=0)
        hf.write_batch(["S0", "S1", "S2"],
                       np.eye(4, dtype=np.float32)[:3])
        assert hf.memory_count == 3
        assert not hf.index_ready
        results = hf.retrieve_similar_memories(
            np.array([1.0, 0, 0, 0]), k=2)
        assert len(results) == 2
        assert results[0][0] == "S0"

    def test_decay_reduces_strength(self):
        hf = HippocampalFormation(small_cfg(), seed=0)
        hf.write_batch(["X"], np.zeros((1, 4), np.float32))
        before = float(hf.state.strength[0])
        hf.decay_memories(decay_rate=0.1)
        after = float(hf.state.strength[0])
        assert 0.0 < after < before

    def test_incremental_writes_after_rebuild(self):
        """Writes after a rebuild are assigned to centroids online and are
        immediately retrievable through the index path."""
        cfg = small_cfg()
        hf = HippocampalFormation(cfg, seed=0)
        rng = np.random.RandomState(1)
        hf.write_batch([f"A{i}" for i in range(8)],
                       np.array([1.0, 0, 0, 0]) + 0.01 * rng.randn(8, 4))
        hf.write_batch([f"B{i}" for i in range(8)],
                       np.array([0, 1.0, 0, 0]) + 0.01 * rng.randn(8, 4))
        hf.rebuild_centroids()
        # post-rebuild online write
        hf.write_batch(["NEW"], np.array([[1.0, 0.01, 0, 0]], np.float32))
        results = hf.retrieve_similar_memories(
            np.array([1.0, 0.01, 0, 0]), k=1)
        assert results[0][0] == "NEW"


class TestEngineCore:
    def test_write_updates_bank(self):
        cfg = small_cfg()
        st = init_memory_state(cfg)
        f = jnp.asarray(np.random.RandomState(0).randn(5, 4), jnp.float32)
        loc = jnp.zeros((5, 2))
        st = write_memories(cfg, st, f, loc)
        assert int(st.count) == 5
        np.testing.assert_allclose(st.features[:5], f, rtol=1e-6)
        np.testing.assert_allclose(st.strength[:5], 1.0)

    def test_fifo_overwrite_and_stale_invalidation(self):
        """Bank full → FIFO overwrite; overwritten slots' old cluster entries
        must not resurface in retrieval (generation check)."""
        cfg = small_cfg(max_memories=8, k_centroids=2, probe_centroids=2)
        hf = HippocampalFormation(cfg, seed=0)
        # fill bank with cluster A
        hf.write_batch([f"A{i}" for i in range(8)],
                       np.tile([1.0, 0, 0, 0], (8, 1)).astype(np.float32)
                       + 0.01 * np.random.RandomState(0).randn(8, 4))
        hf.rebuild_centroids()
        # overwrite everything with cluster B (FIFO wraps)
        hf.write_batch([f"B{i}" for i in range(8)],
                       np.tile([0, 1.0, 0, 0], (8, 1)).astype(np.float32)
                       + 0.01 * np.random.RandomState(1).randn(8, 4))
        results = hf.retrieve_similar_memories(np.array([0, 1.0, 0, 0]), k=4)
        assert all(rid.startswith("B") for rid, _ in results)
        # a query for the overwritten cluster must not return A ids
        results_a = hf.retrieve_similar_memories(np.array([1.0, 0, 0, 0]), k=4)
        assert all(rid.startswith("B") for rid, _ in results_a)

    def test_batched_retrieval_matches_single(self):
        cfg = small_cfg()
        hf = HippocampalFormation(cfg, seed=0)
        rng = np.random.RandomState(2)
        feats = rng.randn(30, 4).astype(np.float32)
        hf.write_batch([f"m{i}" for i in range(30)], feats)
        hf.rebuild_centroids()
        queries = rng.randn(6, 4).astype(np.float32)
        batched = hf.retrieve_batch(queries, k=3)
        for b in range(6):
            single = hf.retrieve_batch(queries[b:b + 1], k=3)
            np.testing.assert_array_equal(batched.indices[b],
                                          single.indices[0])

    def test_recall_vs_bruteforce(self):
        """Index recall@10 vs exact brute force on clustered data ≥ 0.9."""
        cfg = small_cfg(max_memories=2048, feature_dim=32, k_centroids=16,
                        probe_centroids=8)
        st = init_memory_state(cfg)
        rng = np.random.RandomState(3)
        # noise 1.0 vs center scale 3: realistic score spread (the bf16
        # coarse scan cannot rank data whose true score spread is below
        # bf16 resolution; the f32 rerank handles the final ordering).
        centers = rng.randn(16, 32).astype(np.float32) * 3
        feats = (centers[rng.randint(0, 16, 1024)]
                 + 1.0 * rng.randn(1024, 32)).astype(np.float32)
        st = write_memories(cfg, st, jnp.asarray(feats),
                            jnp.zeros((1024, 2)))
        st = rebuild_centroids(cfg, st, jax.random.PRNGKey(0))
        q = jnp.asarray(centers[rng.randint(0, 16, 32)]
                        + 1.0 * rng.randn(32, 32), jnp.float32)
        approx = retrieve(cfg, st, q, None, k=10)
        exact = retrieve_bruteforce(cfg, st, q, None, k=10)
        recall = np.mean([
            len(set(np.asarray(a)) & set(np.asarray(e))) / 10.0
            for a, e in zip(approx.indices, exact.indices)])
        assert recall >= 0.9, f"recall@10 = {recall}"

    def test_temporal_score_prefers_recent(self):
        cfg = small_cfg(seconds_per_step=3600.0)  # 1 step = 1 hour
        st = init_memory_state(cfg)
        f = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (1, 1))
        st = write_memories(cfg, st, f, jnp.zeros((1, 2)))      # old
        st = engine.tick(st, 5.0)
        st = write_memories(cfg, st, f * 0.999, jnp.zeros((1, 2)))  # recent
        res = retrieve_bruteforce(cfg, st, f, None, k=2)
        assert int(res.indices[0, 0]) == 1  # recent one wins on temporal term

    def test_spatial_score(self):
        cfg = small_cfg()
        st = init_memory_state(cfg)
        f = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1))
        locs = jnp.asarray([[0.0, 0.0], [5.0, 5.0]])
        st = write_memories(cfg, st, f, locs)
        res = retrieve_bruteforce(cfg, st, f[:1],
                                  jnp.asarray([[0.0, 0.0]]), k=2)
        assert int(res.indices[0, 0]) == 0  # co-located memory wins

    def test_empty_bank_returns_no_hits(self):
        cfg = small_cfg()
        st = init_memory_state(cfg)
        res = retrieve_bruteforce(cfg, st, jnp.ones((1, 4)), None, k=3)
        assert np.all(np.asarray(res.indices) == -1)


class TestCheckpointRoundtrip:
    def test_state_dict_roundtrip_preserves_ids(self):
        hf = HippocampalFormation(small_cfg(), seed=0)
        rng = np.random.RandomState(4)
        hf.write_batch([f"m{i}" for i in range(20)],
                       rng.randn(20, 4).astype(np.float32))
        hf.rebuild_centroids()
        sd = hf.state_dict()
        hf2 = HippocampalFormation(small_cfg(), seed=99)
        hf2.load_state_dict(sd)
        q = rng.randn(4).astype(np.float32)
        assert (hf.retrieve_similar_memories(q, k=5)
                == hf2.retrieve_similar_memories(q, k=5))


class TestMultiRoundSpill:
    """Capacity-overflow spill must not silently drop rows (r1 weak #4):
    with spill_rounds rounds, a dense region larger than one bucket spreads
    across neighbor buckets and stays reachable by the IVF path."""

    def _skewed_state(self, spill_rounds):
        from aura_snn_rag_tpu.config import MemoryConfig
        from aura_snn_rag_tpu.memory import engine
        from aura_snn_rag_tpu.memory.state import init_memory_state
        import jax
        import jax.numpy as jnp
        import numpy as np
        c = MemoryConfig(max_memories=256, feature_dim=16, k_centroids=8,
                         probe_centroids=8, bucket_overprovision=1.0,
                         spill_rounds=spill_rounds,
                         n_place_cells=8, n_grid_cells=4, n_time_cells=4)
        # one dense blob (3x the mean bucket load) + uniform background
        rng = np.random.RandomState(0)
        dense = rng.randn(96, 16).astype(np.float32) * 0.05 + 3.0
        rest = rng.randn(160, 16).astype(np.float32)
        feats = np.concatenate([dense, rest])
        st = init_memory_state(c)
        st = engine.bulk_load(c, st, jnp.asarray(feats),
                              jnp.zeros((256, 2)))
        st = engine.rebuild_centroids(c, st, jax.random.PRNGKey(0))
        return c, st, feats

    def test_spill_keeps_all_rows_indexed(self):
        import numpy as np
        c, st, feats = self._skewed_state(spill_rounds=4)
        indexed = int(np.asarray(st.bucket_fill).sum())
        assert indexed == 256, f"dropped {256 - indexed} rows from index"

    def test_spilled_rows_retrievable_via_ivf(self):
        import jax.numpy as jnp
        import numpy as np
        from aura_snn_rag_tpu.memory import engine
        c, st, feats = self._skewed_state(spill_rounds=4)
        # query every dense-blob member: its exact self must be in top-1..k
        q = jnp.asarray(feats[:32])
        res = engine.retrieve(c, st, q, None, 5)
        found = 0
        for i in range(32):
            if i in [int(x) for x in np.asarray(res.indices[i])]:
                found += 1
        assert found >= 31, f"only {found}/32 dense rows self-retrieved"
