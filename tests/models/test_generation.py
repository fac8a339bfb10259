"""Generation tests: sampling transforms + KV-cached decode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.config import get_debug_config
from aura_snn_rag_tpu.generation import (
    apply_repetition_penalty, generate, sample_token,
    top_k_filter, top_p_filter,
)
from aura_snn_rag_tpu.models import HippocampalTransformer


class TestFilters:
    def test_top_k(self):
        logits = jnp.asarray([1.0, 5.0, 3.0, 2.0])
        out = np.asarray(top_k_filter(logits, 2))
        assert out[1] == 5.0 and out[2] == 3.0
        assert out[0] < -1e20 and out[3] < -1e20

    def test_top_p_keeps_top1(self):
        logits = jnp.asarray([10.0, 0.0, 0.0, 0.0])
        out = np.asarray(top_p_filter(logits, 0.01))
        assert out[0] == 10.0
        assert (out[1:] < -1e20).all()

    def test_repetition_penalty_sign_aware(self):
        logits = jnp.asarray([2.0, -2.0, 1.0])
        counts = jnp.asarray([1, 1, 0])
        out = np.asarray(apply_repetition_penalty(logits, counts, 2.0))
        np.testing.assert_allclose(out, [1.0, -4.0, 1.0])

    def test_sample_token_respects_topk1(self):
        logits = jnp.asarray([[0.0, 9.0, 1.0]])
        tok = sample_token(jax.random.PRNGKey(0), logits, top_k=1)
        assert int(tok[0]) == 1


class TestGenerate:
    def test_generates_expected_length(self):
        cfg = dataclasses.replace(get_debug_config().model, dropout=0.0)
        model = HippocampalTransformer(cfg)
        ids = jnp.asarray([[1, 2, 3]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        out = generate(model, params, ids, max_new_tokens=5,
                       rng=jax.random.PRNGKey(1))
        assert out.shape == (1, 8)
        assert np.array_equal(np.asarray(out[:, :3]), np.asarray(ids))
        assert (np.asarray(out) >= 0).all()
        assert (np.asarray(out) < cfg.vocab_size).all()

    def test_eos_padding(self):
        cfg = dataclasses.replace(get_debug_config().model, dropout=0.0)
        model = HippocampalTransformer(cfg)
        ids = jnp.asarray([[1, 2]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        out = generate(model, params, ids, max_new_tokens=6,
                       rng=jax.random.PRNGKey(1), eos_token_id=0, top_k=0,
                       temperature=5.0)
        gen = np.asarray(out[0, 2:])
        # after the first 0, everything must stay 0
        zeros = np.where(gen == 0)[0]
        if len(zeros):
            assert (gen[zeros[0]:] == 0).all()
