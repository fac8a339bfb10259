"""Model forward/backward tests — mirrors the reference's
test_hippocampal_transformer.py / test_snn_rag.py semantics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aura_snn_rag_tpu.config import get_debug_config
from aura_snn_rag_tpu.memory import init_memory_state, write_memories
from aura_snn_rag_tpu.models import HippocampalTransformer
from aura_snn_rag_tpu.training.losses import hippocampal_loss


@pytest.fixture(scope="module")
def debug_cfg():
    return get_debug_config()


@pytest.fixture(scope="module")
def model_and_params(debug_cfg):
    cfg = debug_cfg.model
    model = HippocampalTransformer(cfg)
    ids = jnp.zeros((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids,
                        prosody=jnp.zeros((2, 8, 4)), use_memory=True)
    return model, params


class TestForward:
    def test_shapes(self, debug_cfg, model_and_params):
        model, params = model_and_params
        cfg = debug_cfg.model
        ids = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % cfg.vocab_size
        out, _ = model.apply(params, ids, use_memory=True)
        assert out.logits.shape == (2, 8, cfg.vocab_size)
        assert out.place_activity.shape == (2, 8, cfg.n_place_cells)
        assert out.memory_summary.shape == (2, cfg.embedding_dim)
        assert jnp.all(jnp.isfinite(out.logits))

    def test_prosody_changes_output(self, model_and_params):
        model, params = model_and_params
        ids = jnp.ones((1, 8), jnp.int32)
        out0, _ = model.apply(params, ids, use_memory=True)
        prosody = jnp.ones((1, 8, 4)) * 2.0
        out1, _ = model.apply(params, ids, prosody=prosody, use_memory=True)
        assert not np.allclose(out0.logits, out1.logits)

    def test_place_sparsity(self, debug_cfg, model_and_params):
        model, params = model_and_params
        cfg = debug_cfg.model
        ids = jnp.ones((2, 8), jnp.int32)
        out, _ = model.apply(params, ids)
        frac = float((out.place_activity > 0).mean())
        expected = cfg.place_k / cfg.n_place_cells
        assert abs(frac - expected) < 1e-6

    def test_loss_and_grads(self, debug_cfg, model_and_params):
        model, params = model_and_params
        cfg = debug_cfg.model
        ids = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % cfg.vocab_size

        def loss_fn(p):
            out, _ = model.apply(p, ids, use_memory=True)
            return hippocampal_loss(out.logits[:, :-1], ids[:, 1:],
                                    out.place_activity)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert jnp.isfinite(loss)
        leaves = jax.tree.leaves(grads)
        assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
        assert any(jnp.any(g != 0) for g in leaves)

    def test_initial_loss_near_uniform(self, debug_cfg, model_and_params):
        """Fresh model CE should be ~log(V) (reference expects ~10.3 at 32k)."""
        model, params = model_and_params
        cfg = debug_cfg.model
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0,
                                 cfg.vocab_size)
        out, _ = model.apply(params, ids)
        loss = hippocampal_loss(out.logits[:, :-1], ids[:, 1:],
                                entropy_lambda=0.0, label_smoothing=0.0)
        assert abs(float(loss) - np.log(cfg.vocab_size)) < 1.0


class TestSNNFFN:
    def test_snn_layer_forward_backward(self, debug_cfg):
        cfg = dataclasses.replace(debug_cfg.model, snn_layers=(1,))
        model = HippocampalTransformer(cfg)
        ids = jnp.ones((2, 4), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        out, _ = model.apply(params, ids)
        assert jnp.all(jnp.isfinite(out.logits))

        def loss_fn(p):
            o, _ = model.apply(p, ids)
            return o.logits.sum()

        grads = jax.grad(loss_fn)(params)
        # SNN path gradient flows into synapsis weights
        snn = params["params"]["layer_1"]["ffn"]["snn"]
        gsnn = grads["params"]["layer_1"]["ffn"]["snn"]
        assert jax.tree.structure(snn) == jax.tree.structure(gsnn)
        assert any(jnp.any(g != 0) for g in jax.tree.leaves(gsnn))


class TestRAG:
    def test_rag_retrieval_conditions_output(self, debug_cfg):
        """Planted memory changes the forward output (test_snn_rag flow)."""
        mcfg = debug_cfg.memory
        cfg = dataclasses.replace(debug_cfg.model, use_rag=True,
                                  memory_injection="gate")
        model = HippocampalTransformer(cfg, memory_config=mcfg)
        state = init_memory_state(mcfg)
        ids = jnp.ones((2, 4), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, use_memory=True,
                            memory_state=state)

        out_empty, _ = model.apply(params, ids, use_memory=True,
                                   memory_state=state)
        # plant memories
        feats = jax.random.normal(jax.random.PRNGKey(2),
                                  (8, cfg.embedding_dim))
        state2 = write_memories(mcfg, state, feats, jnp.zeros((8, 2)))
        out_mem, _ = model.apply(params, ids, use_memory=True,
                                 memory_state=state2)
        assert not np.allclose(out_empty.logits, out_mem.logits)

    def test_rag_no_memory_flag(self, debug_cfg):
        mcfg = debug_cfg.memory
        cfg = dataclasses.replace(debug_cfg.model, use_rag=True)
        model = HippocampalTransformer(cfg, memory_config=mcfg)
        state = init_memory_state(mcfg)
        ids = jnp.ones((1, 4), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, use_memory=True,
                            memory_state=state)
        out, _ = model.apply(params, ids, use_memory=False)
        assert jnp.all(jnp.isfinite(out.logits))


class TestKVCache:
    def test_incremental_decode_matches_full(self, debug_cfg):
        cfg = dataclasses.replace(debug_cfg.model, dropout=0.0)
        model = HippocampalTransformer(cfg)
        ids = jnp.asarray([[3, 5, 7, 11, 13, 17]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        full, _ = model.apply(params, ids, use_memory=True)

        caches = model.init_kv_caches(1, 8)
        logits_steps = []
        for t in range(ids.shape[1]):
            out, caches = model.apply(
                params, ids[:, t:t + 1], use_memory=True,
                positions=jnp.asarray([[t]]), kv_caches=caches,
                cache_index=jnp.asarray(t))
            logits_steps.append(out.logits[:, 0])
        inc = jnp.stack(logits_steps, axis=1)
        np.testing.assert_allclose(np.asarray(full.logits), np.asarray(inc),
                                   rtol=2e-2, atol=2e-2)


class TestLoss:
    def test_label_smoothing_and_mask(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16))
        labels = jnp.asarray([[1, 2, -100, -100], [3, 4, 5, -100]])
        loss = hippocampal_loss(logits, labels)
        assert jnp.isfinite(loss)

    def test_entropy_term_lowers_loss_for_uniform(self):
        """Entropy is maximized: uniform logits → lower total loss than
        confident wrong logits."""
        V = 16
        labels = jnp.zeros((1, 4), jnp.int32)
        uniform = jnp.zeros((1, 4, V))
        confident_wrong = jax.nn.one_hot(
            jnp.ones((1, 4), jnp.int32), V) * 20.0
        l_u = hippocampal_loss(uniform, labels, entropy_lambda=0.5,
                               label_smoothing=0.0)
        l_c = hippocampal_loss(confident_wrong, labels, entropy_lambda=0.5,
                               label_smoothing=0.0)
        assert float(l_u) < float(l_c)
