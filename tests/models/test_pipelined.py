"""Pipelined HippocampalTransformer forward == full-model forward.

4 'stage' devices on the virtual CPU mesh; the model's layer stack is
regrouped into stacked per-stage params and run through the GPipe ring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from aura_snn_rag_tpu.config import get_debug_config
from aura_snn_rag_tpu.models import HippocampalTransformer
from aura_snn_rag_tpu.models.pipelined import (
    pipelined_lm_apply, stage_pattern)


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:4]).reshape(4)
    return Mesh(devs, ("stage",))


def make_model(num_layers=4, snn_layers=()):
    cfg = get_debug_config().model
    cfg = dataclasses.replace(cfg, num_layers=num_layers, use_rag=False,
                              snn_layers=tuple(snn_layers))
    return HippocampalTransformer(cfg, deterministic=True)


class TestPipelinedLM:
    def test_matches_full_forward(self, mesh):
        model = make_model()
        rng = np.random.RandomState(0)
        ids = jnp.asarray(rng.randint(0, 512, (8, 32)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, use_memory=True)

        ref, _ = model.apply(params, ids, use_memory=True)
        got = pipelined_lm_apply(model, params, ids, mesh,
                                 num_microbatches=4)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(ref.logits),
                                   rtol=0.05, atol=0.02)

    def test_snn_pattern_stages(self, mesh):
        # SNN FFN on even layers, 2 stages of 2 layers → uniform
        # (True, False) pattern; run on a 2-stage submesh
        devs = np.asarray(jax.devices()[:2]).reshape(2)
        mesh2 = Mesh(devs, ("stage",))
        model = make_model(num_layers=4, snn_layers=(0, 2))
        assert stage_pattern(model.config, 2) == (True, False)
        rng = np.random.RandomState(1)
        ids = jnp.asarray(rng.randint(0, 512, (4, 32)), jnp.int32)
        prosody = jnp.asarray(rng.rand(4, 32, 4), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), ids, prosody=prosody,
                            use_memory=True)
        ref, _ = model.apply(params, ids, prosody=prosody, use_memory=True)
        got = pipelined_lm_apply(model, params, ids, mesh2,
                                 num_microbatches=2, prosody=prosody)
        # GIF spike thresholds amplify bf16 reorder noise on a handful of
        # elements — check the distribution, not elementwise equality
        diff = np.abs(np.asarray(got) - np.asarray(ref.logits))
        assert np.quantile(diff, 0.999) < 0.05, np.quantile(diff, 0.999)
        assert diff.max() < 0.1, diff.max()
        # argmax agreement is a weak check for UNTRAINED logits (std ~0.16
        # over 512 classes → near-ties everywhere; even the no-SNN case
        # only agrees 99.2%) — keep it as a sanity floor
        agree = np.mean(np.asarray(got).argmax(-1)
                        == np.asarray(ref.logits).argmax(-1))
        assert agree >= 0.9, agree

    def test_prosody_wiring_exact(self, mesh):
        # prosody through the pipeline without SNN: pure bf16 reorder
        # noise only (isolates prosody plumbing from spike quantization)
        devs = np.asarray(jax.devices()[:2]).reshape(2)
        mesh2 = Mesh(devs, ("stage",))
        model = make_model(num_layers=4, snn_layers=())
        rng = np.random.RandomState(1)
        ids = jnp.asarray(rng.randint(0, 512, (4, 32)), jnp.int32)
        prosody = jnp.asarray(rng.rand(4, 32, 4), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), ids, prosody=prosody,
                            use_memory=True)
        ref, _ = model.apply(params, ids, prosody=prosody, use_memory=True)
        got = pipelined_lm_apply(model, params, ids, mesh2,
                                 num_microbatches=2, prosody=prosody)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(ref.logits),
                                   rtol=0.05, atol=0.02)

    def test_nonuniform_pattern_rejected(self):
        model = make_model(num_layers=4, snn_layers=(0, 1))
        with pytest.raises(AssertionError, match="not uniform"):
            stage_pattern(model.config, 2)
