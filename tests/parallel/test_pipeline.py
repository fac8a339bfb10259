"""GPipe-style pipeline over a 'stage' mesh axis (4 stages on the virtual
CPU mesh): output equivalence vs sequential, and gradient flow/sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from aura_snn_rag_tpu.parallel.pipeline import (
    pipeline_apply, split_microbatches, stack_stage_params)


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:4]).reshape(4)
    return Mesh(devs, ("stage",))


def block_fn(params, x):
    # a shape-preserving two-matmul block with nonlinearity
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return x + h @ params["w2"]


def make_params(rng, s, d=16):
    return {"w1": rng.randn(d, 2 * d).astype(np.float32) * 0.1,
            "b1": np.zeros(2 * d, np.float32),
            "w2": rng.randn(2 * d, d).astype(np.float32) * 0.1}


class TestPipeline:
    def test_matches_sequential(self, mesh):
        rng = np.random.RandomState(0)
        per_stage = [jax.tree.map(jnp.asarray, make_params(rng, s))
                     for s in range(4)]
        stacked = stack_stage_params(per_stage, mesh)
        x = jnp.asarray(rng.randn(8, 16).astype(np.float32))
        mbs = split_microbatches(x, 4)                    # M=4, mb=2

        out = pipeline_apply(block_fn, stacked, mbs, mesh)
        assert out.shape == (4, 2, 16)

        seq = x
        for p in per_stage:
            seq = block_fn(p, seq)
        np.testing.assert_allclose(
            np.asarray(out).reshape(8, 16), np.asarray(seq),
            rtol=2e-5, atol=2e-5)

    def test_gradients_flow_to_every_stage(self, mesh):
        rng = np.random.RandomState(1)
        per_stage = [jax.tree.map(jnp.asarray, make_params(rng, s))
                     for s in range(4)]
        stacked = stack_stage_params(per_stage, mesh)
        x = jnp.asarray(rng.randn(8, 16).astype(np.float32))
        mbs = split_microbatches(x, 4)
        tgt = jnp.asarray(rng.randn(4, 2, 16).astype(np.float32))

        def loss_fn(params):
            out = pipeline_apply(block_fn, params, mbs, mesh)
            return jnp.mean((out - tgt) ** 2)

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(stacked)
        assert np.isfinite(float(loss))
        gnorms = jax.tree.map(
            lambda g: np.asarray(jnp.linalg.norm(
                g.reshape(g.shape[0], -1), axis=1)), grads)
        # every stage's shard received a nonzero gradient
        for leaf in jax.tree.leaves(gnorms):
            assert (leaf > 0).all(), leaf

        # grads match the sequential model's grads
        def seq_loss(per_stage_list):
            h = x
            for p in per_stage_list:
                h = block_fn(p, h)
            return jnp.mean((h.reshape(4, 2, 16) - tgt) ** 2)

        seq_grads = jax.grad(seq_loss)([dict(p) for p in per_stage])
        for s in range(4):
            for key in ("w1", "b1", "w2"):
                np.testing.assert_allclose(
                    np.asarray(grads[key][s]),
                    np.asarray(seq_grads[s][key]), rtol=1e-4, atol=1e-5)

    def test_composes_with_model_axis(self):
        # ('stage','model') mesh: pipeline over stages while the block is
        # free to be tensor-parallel over 'model'
        devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
        mesh = Mesh(devs, ("stage", "model"))
        rng = np.random.RandomState(2)
        per_stage = [jax.tree.map(jnp.asarray, make_params(rng, s))
                     for s in range(4)]
        stacked = stack_stage_params(per_stage, mesh)
        x = jnp.asarray(rng.randn(4, 16).astype(np.float32))
        out = pipeline_apply(block_fn, stacked, split_microbatches(x, 2),
                             mesh)
        seq = x
        for p in per_stage:
            seq = block_fn(p, seq)
        np.testing.assert_allclose(np.asarray(out).reshape(4, 16),
                                   np.asarray(seq), rtol=2e-5, atol=2e-5)
