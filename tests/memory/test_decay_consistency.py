"""Decay/rebuild strength-encoding consistency across retrieval paths.

The IVF path reconstructs strength as exp(decay_accum − cluster_decay);
the flat/brute paths read the bank strength array. Writes, decays, and
rebuilds interleaved must keep all three paths ranking identically.
Also covers keyword→cerebellum zone factory parity
(test_thalamic_routing_spiking.py:4-27 semantics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.config import MemoryConfig
from aura_snn_rag_tpu.memory import (
    bulk_load, decay_memories, init_memory_state, rebuild_centroids,
    retrieve, retrieve_bruteforce, write_memories)
from aura_snn_rag_tpu.memory import engine


def cfg(**kw):
    base = dict(max_memories=512, feature_dim=32, k_centroids=8,
                probe_centroids=8, n_place_cells=8, n_grid_cells=4,
                n_time_cells=4, use_pallas_ivf=False)
    base.update(kw)
    return MemoryConfig(**base)


class TestDecayConsistency:
    def test_strength_encoding_survives_decay_and_rebuild(self):
        c = cfg()
        st = init_memory_state(c)
        rng = np.random.RandomState(0)
        feats = rng.randn(256, 32).astype(np.float32)
        st = bulk_load(c, st, jnp.asarray(feats), jnp.zeros((256, 2)))
        st = rebuild_centroids(c, st, jax.random.PRNGKey(0))

        # decay twice, write more (fresh strength), rebuild again
        st = decay_memories(st, 0.2)
        st = decay_memories(st, 0.1)
        st = write_memories(c, st, jnp.asarray(rng.randn(16, 32),
                                               jnp.float32),
                            jnp.zeros((16, 2)))
        q = jnp.asarray(rng.randn(8, 32), jnp.float32)
        ivf = retrieve(c, st, q, None, 5)
        exact = retrieve_bruteforce(c, st, q, None, 5)
        # scores agree for shared hits (strength reconstruction is exact)
        for b in range(8):
            ei = np.asarray(exact.indices[b])
            es = np.asarray(exact.scores[b])
            ai = np.asarray(ivf.indices[b])
            as_ = np.asarray(ivf.scores[b])
            for j, idx in enumerate(ai):
                if idx in ei:
                    k = list(ei).index(idx)
                    np.testing.assert_allclose(as_[j], es[k], rtol=1e-4)

        st = rebuild_centroids(c, st, jax.random.PRNGKey(1))
        ivf2 = retrieve(c, st, q, None, 5)
        exact2 = retrieve_bruteforce(c, st, q, None, 5)
        # rebuild re-encodes current strengths; paths still agree on top-1
        top1 = [int(x[0]) for x in np.asarray(ivf2.indices)]
        top1e = [int(x[0]) for x in np.asarray(exact2.indices)]
        assert np.mean([a == b for a, b in zip(top1, top1e)]) >= 0.75

    def test_fifo_wrap_with_decay(self):
        c = cfg(max_memories=32)
        st = init_memory_state(c)
        rng = np.random.RandomState(1)
        st = bulk_load(c, st, jnp.asarray(rng.randn(32, 32), jnp.float32),
                       jnp.zeros((32, 2)))
        st = rebuild_centroids(c, st, jax.random.PRNGKey(0))
        st = decay_memories(st, 0.5)
        # overwrite half the bank (FIFO wrap) with fresh rows
        fresh = rng.randn(16, 32).astype(np.float32)
        st = write_memories(c, st, jnp.asarray(fresh), jnp.zeros((16, 2)))
        # fresh rows have strength 1.0; retrieval for a fresh row wins it
        res = retrieve_bruteforce(c, st, jnp.asarray(fresh[:1]), None, 1)
        assert int(res.indices[0, 0]) == 0  # slot 0 was overwritten first


class TestZoneFactoryParity:
    def test_cerebellum_routes_and_spikes(self, rng):
        """Keyword 'timeline' routes toward cerebellum; the fast-spiking
        zone produces spikes under positive drive."""
        from aura_snn_rag_tpu.zones.brain_zone import (
            NeuromorphicBrainZone, create_cerebellum)
        from aura_snn_rag_tpu.zones.processor import ContentRouter

        router = ContentRouter()
        zones = router.route_text_to_zones("order the timeline sequence")
        assert "cerebellum" in zones

        zc = create_cerebellum(n_neurons=32, input_dim=16, output_dim=16)
        zone = NeuromorphicBrainZone(zc)
        x = jnp.abs(jax.random.normal(rng, (2, 16))) * 2
        vars_ = zone.init(rng, x)
        (out, stats), _ = zone.apply(vars_, x, mutable=["constants"])
        assert float(stats["spike_count"]) > 0
