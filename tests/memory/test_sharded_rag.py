"""RAG forward against a SHARDED memory bank: the injectable retrieve seam
wired to the shard_map path, on the virtual multi-device mesh."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from aura_snn_rag_tpu.config import get_debug_config
from aura_snn_rag_tpu.memory.sharded import (
    init_sharded_memory, retrieve_sharded, write_memories_sharded)
from aura_snn_rag_tpu.models import HippocampalTransformer


class TestShardedRAG:
    def test_forward_with_sharded_bank(self):
        devs = np.asarray(jax.devices()[:4]).reshape(4, 1)
        mesh = Mesh(devs, ("data", "model"))
        cfg = get_debug_config()
        mcfg = dataclasses.replace(cfg.memory, max_memories=64)
        model_cfg = dataclasses.replace(cfg.model, use_rag=True,
                                        dropout=0.0)

        def sharded_retrieve(memory_config, memory_state, queries, k):
            return retrieve_sharded(memory_config, mesh, memory_state,
                                    queries, k)

        model = HippocampalTransformer(
            model_cfg, memory_config=mcfg, retrieve_fn=sharded_retrieve)

        state = init_sharded_memory(mcfg, mesh)
        rng = np.random.RandomState(0)
        feats = rng.randn(16, model_cfg.embedding_dim).astype(np.float32)
        state = write_memories_sharded(
            mcfg, mesh, state, jnp.asarray(feats), jnp.zeros((16, 2)))

        ids = jnp.ones((2, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, use_memory=True,
                            memory_state=state)
        out, _ = model.apply(params, ids, use_memory=True,
                             memory_state=state)
        assert jnp.all(jnp.isfinite(out.logits))

        # the sharded bank actually conditions the output
        empty = init_sharded_memory(mcfg, mesh)
        out_empty, _ = model.apply(params, ids, use_memory=True,
                                   memory_state=empty)
        assert not np.allclose(np.asarray(out.logits),
                               np.asarray(out_empty.logits))
