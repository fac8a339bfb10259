"""True expert parallelism (VERDICT r1 #4 / SURVEY §2.8 EP row).

Top-k capacity dispatch must (a) match the dense run-all-and-mask combine
when capacity is ample, (b) account for drops when capacity is tight, and
(c) run sharded over the mesh 'model' axis (stacked [E, ...] expert params
partitioned; dispatch einsum becomes the all_to_all) with identical output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aura_snn_rag_tpu.models.language_zone import (
    ExpertBank, FullLanguageZone, topk_dispatch)
from aura_snn_rag_tpu.parallel.mesh import param_specs


class TestTopkDispatch:
    def test_plan_shapes_and_weights(self):
        idx = jnp.asarray([[0, 1], [1, 2], [0, 3]])
        w = jnp.asarray([[0.7, 0.3], [0.6, 0.4], [0.5, 0.5]])
        dispatch, combine, dropped = topk_dispatch(idx, w, 4, capacity=2)
        assert dispatch.shape == (3, 4, 2)
        # every assignment kept (capacity ample)
        assert float(dropped) == 0.0
        # combine carries the routing weight at the dispatched slot
        np.testing.assert_allclose(combine.sum(), w.sum(), rtol=1e-6)

    def test_capacity_overflow_drops_later_tokens(self):
        # all 4 tokens pick expert 0; capacity 2 → half dropped
        idx = jnp.zeros((4, 1), jnp.int32)
        w = jnp.ones((4, 1))
        dispatch, combine, dropped = topk_dispatch(idx, w, 2, capacity=2)
        np.testing.assert_allclose(float(dropped), 0.5)
        # the kept ones are the EARLIER tokens (order-stable)
        assert float(dispatch[0].sum()) == 1.0
        assert float(dispatch[3].sum()) == 0.0


def _bank_and_inputs(B=6, T=4, D=16, E=4, seed=0):
    bank = ExpertBank(E, D, D, levels=4, capacity_factor=8.0)
    x = jax.random.normal(jax.random.PRNGKey(seed), (B, T, D))
    rng = np.random.RandomState(seed)
    idx = jnp.asarray(rng.randint(0, E, (B, 2)), jnp.int32)
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(seed + 1),
                                         (B, 2)))
    params = bank.init(jax.random.PRNGKey(2), x,
                       {"indices": idx, "weights": w})
    return bank, params, x, {"indices": idx, "weights": w}


class TestExpertBankSparse:
    def test_sparse_matches_dense_masked_combine(self):
        bank, params, x, routing = _bank_and_inputs()
        y_sparse, aux = bank.apply(params, x, routing)
        assert float(aux["dropped_fraction"]) == 0.0

        expert_out = bank.apply(params, x)                # [B, E, D] dense
        B, E = expert_out.shape[:2]
        w_full = jnp.zeros((B, E))
        w_full = jax.vmap(lambda wv, i, v: wv.at[i].add(v))(
            w_full, routing["indices"], routing["weights"])
        y_dense = jnp.einsum("be,bed->bd", w_full, expert_out)
        np.testing.assert_allclose(np.asarray(y_sparse),
                                   np.asarray(y_dense), atol=2e-5)

    def test_expert_params_get_model_axis_specs(self):
        bank, params, x, routing = _bank_and_inputs()
        specs = param_specs(params)
        leaves = jax.tree_util.tree_leaves_with_path(specs)
        expert_specs = [s for kp, s in leaves
                        if "experts" in "/".join(str(k) for k in kp)]
        assert expert_specs, "no expert params found"
        assert all(s[0] == "model" for s in expert_specs)

    def test_sharded_forward_matches_unsharded(self):
        bank, params, x, routing = _bank_and_inputs()
        y_ref, _ = bank.apply(params, x, routing)

        devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
        mesh = Mesh(devs, ("data", "model"))
        specs = param_specs(params)
        sharded = jax.tree.map(
            lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
            params, specs)

        @jax.jit
        def fwd(p, xx, idx, w):
            return bank.apply(p, xx, {"indices": idx, "weights": w})[0]

        y_ep = fwd(sharded, x, routing["indices"], routing["weights"])
        np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_ref),
                                   atol=2e-5)


class TestZoneSparseDispatch:
    def test_zone_runs_with_sparse_dispatch_and_reports_aux(self):
        zone = FullLanguageZone(d_model=16, num_experts=4, top_k=2,
                                timesteps=2, levels=4)
        ids = jnp.ones((3, 5), jnp.int32)
        feats = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 16))
        params = zone.init(jax.random.PRNGKey(1), ids, feats)
        out, info = zone.apply(params, ids, feats)
        assert out.shape == (3, 16)
        assert np.isfinite(np.asarray(out)).all()
        assert "dropped_fraction" in info

    def test_dense_flag_preserves_reference_behavior(self):
        zone = FullLanguageZone(d_model=16, num_experts=4, top_k=2,
                                timesteps=2, levels=4, dense_dispatch=True)
        ids = jnp.ones((3, 5), jnp.int32)
        feats = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 16))
        params = zone.init(jax.random.PRNGKey(1), ids, feats)
        out, info = zone.apply(params, ids, feats)
        assert out.shape == (3, 16)
        assert "dropped_fraction" not in info
