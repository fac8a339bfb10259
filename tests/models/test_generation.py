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

    def test_greedy_cached_matches_full_recompute(self):
        """Greedy decode through the KV cache must emit the IDENTICAL token
        sequence as the reference's recompute-the-whole-prefix scheme
        (snn_rag_transformer.py:166-244) — the decode path's correctness
        contract, independent of per-step logits tolerance."""
        cfg = dataclasses.replace(get_debug_config().model, dropout=0.0)
        model = HippocampalTransformer(cfg)
        ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        T = 8
        out = generate(model, params, ids, max_new_tokens=T,
                       rng=jax.random.PRNGKey(1), top_k=1,
                       temperature=1.0, repetition_penalty=1.0)
        cached_tokens = np.asarray(out[0, ids.shape[1]:])

        seq = ids
        ref_tokens = []
        for _ in range(T):
            full, _ = model.apply(params, seq, use_memory=False)
            nxt = jnp.argmax(full.logits[:, -1], axis=-1).astype(jnp.int32)
            ref_tokens.append(int(nxt[0]))
            seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
        np.testing.assert_array_equal(cached_tokens, np.asarray(ref_tokens))

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


class TestFusedTopKTopP:
    """The fused top-k/top-p sampling path must induce exactly the same
    distribution as composing the full-vocab filters."""

    def test_distribution_matches_filter_composition(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from aura_snn_rag_tpu.generation.sampler import (
            NEG_INF, top_k_filter, top_p_filter)

        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(3, 101).astype(np.float32) * 3)
        k, p = 17, 0.8
        ref = top_p_filter(top_k_filter(logits, k), p)
        ref_probs = np.asarray(jax.nn.softmax(ref, axis=-1))

        # reproduce the fused path's kept set/probabilities
        vals, idx = jax.lax.top_k(logits, k)
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        vals = jnp.where((cum - probs) <= p, vals, NEG_INF)
        fused = np.zeros_like(ref_probs)
        fp = np.asarray(jax.nn.softmax(vals, axis=-1))
        np.put_along_axis(fused, np.asarray(idx), fp, axis=-1)
        np.testing.assert_allclose(fused, ref_probs, atol=1e-6)

    def test_greedy_topk1_deterministic(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from aura_snn_rag_tpu.generation.sampler import sample_token

        logits = jnp.asarray(np.random.RandomState(1).randn(4, 64),
                             jnp.float32)
        tok = sample_token(jax.random.PRNGKey(0), logits, top_k=1)
        np.testing.assert_array_equal(np.asarray(tok),
                                      np.asarray(logits.argmax(-1)))


class TestBlockwiseTopK:
    """exact_topk_blockwise: value-exact vs lax.top_k on the vocab scale."""

    def test_values_match_lax_topk(self):
        import jax
        import jax.numpy as jnp
        from aura_snn_rag_tpu.generation.sampler import exact_topk_blockwise
        rng = np.random.RandomState(0)
        for V, k in ((32000, 50), (31999, 50), (1000, 17), (100, 100)):
            x = jnp.asarray(rng.randn(3, V).astype(np.float32))
            v_ref, i_ref = jax.lax.top_k(x, min(k, V))
            v_blk, i_blk = exact_topk_blockwise(x, min(k, V))
            np.testing.assert_allclose(np.asarray(v_blk), np.asarray(v_ref))
            # distinct values -> identical indices (randn: ties ~impossible)
            np.testing.assert_array_equal(np.asarray(i_blk),
                                          np.asarray(i_ref))

    def test_indices_valid_under_ties(self):
        import jax
        import jax.numpy as jnp
        from aura_snn_rag_tpu.generation.sampler import exact_topk_blockwise
        x = jnp.zeros((2, 512)).at[:, 7].set(1.0)     # massive tie plateau
        v, i = exact_topk_blockwise(x, 5)
        assert (np.asarray(v[:, 0]) == 1.0).all()
        assert (np.asarray(i[:, 0]) == 7).all()
        assert ((np.asarray(i) >= 0) & (np.asarray(i) < 512)).all()
        got = np.asarray(jnp.take_along_axis(x, i, axis=-1))
        np.testing.assert_allclose(got, np.asarray(v))

    def test_sampled_distribution_identical(self):
        """sample_token(topk_impl='blockwise') must sample the same token
        as the sort path under the same rng when values are distinct."""
        import jax
        import jax.numpy as jnp
        from aura_snn_rag_tpu.generation.sampler import sample_token
        rng = np.random.RandomState(3)
        logits = jnp.asarray(rng.randn(4, 32000).astype(np.float32))
        key = jax.random.PRNGKey(9)
        a = sample_token(key, logits, 0.8, 50, 0.9)
        b = sample_token(key, logits, 0.8, 50, 0.9, topk_impl="blockwise")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
