"""Prosody chain + spiking MoE language zone tests — mirrors the
reference's prosody benchmark semantics and test_snn_rag zone sections."""

import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.models.language_zone import (
    ExpertBank, FullLanguageZone, MoELanguageZone, SNNExpert)
from aura_snn_rag_tpu.models.prosody import (
    ANALYTICAL_BALANCED, CachedProsodyBridge, ProsodyAttentionConfig,
    multi_channel_spiking_attention, prosody_attention_gains,
    prosody_channels_from_tokens, prosody_gif_scan)
from aura_snn_rag_tpu.ops.neurons import gif_params
from aura_snn_rag_tpu.ops.snn_ops import (
    piecewise_silu, snn_matmul, snn_rmsnorm, snn_softmax)
from aura_snn_rag_tpu.ops.spike_bridge import (
    continuous_to_spikes, spikes_to_continuous)


class TestSpikeBridges:
    def test_rate_bridge(self):
        s = jnp.asarray([[[1.0, 0.0], [1.0, 1.0]]])  # [1, T=2, D=2]
        np.testing.assert_allclose(
            spikes_to_continuous(s, "rate"), [[1.0, 0.5]])

    def test_temporal_bridge_recency(self):
        early = jnp.zeros((1, 4, 1)).at[0, 0, 0].set(1.0)
        late = jnp.zeros((1, 4, 1)).at[0, 3, 0].set(1.0)
        assert float(spikes_to_continuous(late, "temporal")[0, 0]) > \
            float(spikes_to_continuous(early, "temporal")[0, 0])

    def test_phase_bridge_finite(self):
        s = (jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 4)) > 0.5
             ).astype(jnp.float32)
        out = spikes_to_continuous(s, "phase")
        assert out.shape == (2, 4)
        assert jnp.all(jnp.abs(out) <= 1.0 + 1e-6)

    def test_poisson_encode_rate_tracks_sigmoid(self):
        x = jnp.asarray([[-5.0, 0.0, 5.0]])
        s = continuous_to_spikes(x, 64, jax.random.PRNGKey(0), "poisson")
        rates = np.asarray(s.mean(axis=-2))[0]
        assert rates[0] < 0.15 and abs(rates[1] - 0.5) < 0.2 \
            and rates[2] > 0.85

    def test_temporal_encode_monotone(self):
        x = jnp.asarray([[0.0, 3.0]])
        s = continuous_to_spikes(x, 4, jax.random.PRNGKey(0), "temporal")
        assert s[..., 1].sum() > s[..., 0].sum()


class TestSNNOps:
    def test_snn_matmul_scaling(self):
        s = jnp.ones((2, 16))
        w = jnp.ones((16, 4))
        np.testing.assert_allclose(snn_matmul(s, w), 16 / 4.0, rtol=1e-5)

    def test_piecewise_silu_close_to_silu(self):
        x = jnp.linspace(-3, 3, 50)
        err = jnp.abs(piecewise_silu(x) - jax.nn.silu(x)).max()
        assert float(err) < 0.5  # LUT approximation tolerance

    def test_rmsnorm(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8)) * 3
        out = snn_rmsnorm(x, jnp.ones(8))
        rms = jnp.sqrt((out ** 2).mean(axis=-1))
        np.testing.assert_allclose(np.asarray(rms), 1.0, rtol=1e-3)


class TestProsody:
    def test_channels_deterministic(self):
        ids = jnp.asarray([[1, 2, 3]])
        a1, p1, b1 = prosody_channels_from_tokens(ids)
        a2, p2, b2 = prosody_channels_from_tokens(ids)
        np.testing.assert_array_equal(a1, a2)
        assert a1.shape == (1, 3)

    def test_attention_gains_bounds(self):
        ids = jnp.arange(32).reshape(1, 32)
        gains, info = prosody_attention_gains(ids)
        assert gains.shape == (1, 32)
        cfg = ProsodyAttentionConfig()
        assert float(info["mu_scalar"][0]) <= cfg.max_gain
        assert float(info["mu_scalar"][0]) >= cfg.min_gain
        assert float(gains.max()) <= cfg.max_gain * 2.0 + 1e-5

    def test_cached_bridge_lru(self):
        bridge = CachedProsodyBridge(ANALYTICAL_BALANCED, cache_size=2)
        ids = np.arange(16).reshape(1, 16)
        g1 = bridge(ids)
        g2 = bridge(ids)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
        assert bridge.stats["hits"] == 1 and bridge.stats["misses"] == 1

    def test_prosody_gif_high_gain_spikes_more(self):
        p = gif_params(levels=8)
        x = jnp.ones((1, 8, 16)) * 0.8
        low, _ = prosody_gif_scan(p, x, jnp.full((1, 8), 0.5))
        high, _ = prosody_gif_scan(p, x, jnp.full((1, 8), 2.0))
        assert float(high.sum()) > float(low.sum())


class TestLanguageZones:
    def test_snn_expert(self, rng):
        ex = SNNExpert(hidden_dim=16, output_dim=8)
        x = jax.random.normal(rng, (2, 4, 16))
        params = ex.init(rng, x)
        out = ex.apply(params, x)
        assert out.shape == (2, 8)

    def test_expert_bank_distinct_experts(self, rng):
        bank = ExpertBank(num_experts=3, hidden_dim=8, output_dim=4)
        x = jax.random.normal(rng, (2, 4, 8))
        params = bank.init(rng, x)
        out = bank.apply(params, x)
        assert out.shape == (2, 3, 4)
        # different experts → different outputs
        assert not np.allclose(np.asarray(out[:, 0]), np.asarray(out[:, 1]))

    def test_full_language_zone(self, rng):
        zone = FullLanguageZone(d_model=32, num_experts=4, top_k=2)
        ids = jnp.arange(8).reshape(1, 8)
        feats = jax.random.normal(rng, (1, 8, 32))
        params = zone.init(rng, ids, feats)
        out, info = zone.apply(params, ids, feats, rng)
        assert out.shape == (1, 32)
        assert jnp.all(jnp.isfinite(out))
        assert info["routing"]["weights"].shape == (1, 2)

    def test_moe_language_zone_lm(self, rng):
        lm = MoELanguageZone(vocab_size=100, d_model=32, num_experts=4)
        ids = jnp.arange(8).reshape(1, 8)
        params = lm.init(rng, ids)
        logits, info = lm.apply(params, ids, rng)
        assert logits.shape == (1, 100)

        def loss(p):
            lg, _ = lm.apply(p, ids, rng)
            return lg.sum()

        g = jax.grad(loss)(params)
        assert any(jnp.any(l != 0) for l in jax.tree.leaves(g))


class TestEmotionModulatedProsody:
    """Emotion-head → prosody wiring (the reference's open TODO,
    /root/reference/TODO.md:6): emotion posteriors map to circumplex
    (arousal, valence) and modulate gains + the [B, L, 4] prosody tensor."""

    def _setup(self):
        import jax
        from aura_snn_rag_tpu.models.emotion_head import (
            EmotionHeadConfig, EmotionPersonalityHead)
        head = EmotionPersonalityHead(EmotionHeadConfig(d_model=16,
                                                        trunk_dim=8))
        feats = jax.random.normal(jax.random.PRNGKey(0), (3, 7, 16))
        params = head.init(jax.random.PRNGKey(1), feats.mean(axis=1))
        ids = jnp.asarray(np.random.RandomState(0).randint(1, 100, (3, 7)))
        return head, params, ids, feats

    def test_shapes_and_finiteness(self):
        from aura_snn_rag_tpu.models.prosody import emotion_modulated_prosody
        head, params, ids, feats = self._setup()
        gains, prosody, info = emotion_modulated_prosody(
            ids, feats, head, params)
        assert gains.shape == (3, 7)
        assert prosody.shape == (3, 7, 4)
        assert np.isfinite(np.asarray(gains)).all()
        assert info["emotion_probs"].shape == (3, 8)
        # arousal channel == prosody channel 0 and 2
        np.testing.assert_allclose(np.asarray(prosody[..., 0]),
                                   np.asarray(prosody[..., 2]))

    def test_arousal_raises_gains(self):
        """Force high-arousal (anger) vs low-arousal (neutral) posteriors
        through the circumplex mapping: gains must be larger for anger."""
        import jax
        from aura_snn_rag_tpu.models import prosody as pm
        head, params, ids, feats = self._setup()

        class FakeHead:
            def __init__(self, emo_idx):
                self.emo_idx = emo_idx

            def apply(self, p, x):
                B = x.shape[0]
                logits = jnp.full((B, 8), -10.0).at[:, self.emo_idx].set(10.0)
                return {"emotion": logits,
                        "intent": jnp.zeros((B, 6)),
                        "tone": jnp.zeros((B, 4)),
                        "personality": jnp.zeros((B, 5))}

        g_anger, pr_anger, _ = pm.emotion_modulated_prosody(
            ids, feats, FakeHead(2), None)   # anger: arousal 0.9
        g_neutral, pr_neutral, _ = pm.emotion_modulated_prosody(
            ids, feats, FakeHead(7), None)   # neutral: arousal 0.2
        assert float(g_anger.mean()) > float(g_neutral.mean())
        assert float(pr_anger[..., 0].mean()) > float(pr_neutral[..., 0].mean())
        # valence signs: anger negative, neutral ~0
        assert float(pr_anger[..., 1].mean()) < -0.5


class TestTextProsodyChannels:
    """prosody_channels_from_strings — the 'real pipeline' channel source
    the reference stubs out (prosody_attention.py:22-24; its optimized
    bridge passes strings into the id-hash function, a latent type bug)."""

    def test_emphasis_drives_amplitude(self):
        from aura_snn_rag_tpu.models.prosody import (
            prosody_channels_from_strings)
        amp_c, _, bnd_c = prosody_channels_from_strings(
            "the report covers the second quarter".split())
        amp_s, _, bnd_s = prosody_channels_from_strings(
            "WOW this is absolutely INCREDIBLE!!".split())
        assert amp_s.mean() > amp_c.mean() + 0.1
        assert bnd_s.max() == 1.0          # '!!' marks a boundary
        assert amp_c.shape[0] == 1 and amp_c.dtype == np.float32

    def test_regimes_separate_through_attention(self):
        """Calm vs emphatic text must yield distinct mean gains through the
        unnormalized (k7_aggressive) spiking-attention chain — the property
        the MoE routing ablation measures."""
        import jax.numpy as jnp
        from aura_snn_rag_tpu.models.prosody import (
            SWEEP_CONFIGS, multi_channel_spiking_attention,
            prosody_channels_from_strings)

        def gain(text):
            a, p, b = prosody_channels_from_strings(text.split())
            r = multi_channel_spiking_attention(
                jnp.asarray(a), jnp.asarray(p), jnp.asarray(b),
                SWEEP_CONFIGS["k7_aggressive"])
            g = r["mu_scalar"][:, None] * (1.0 + r["salience"])
            return float(np.asarray(g).mean())

        calm = gain("the recipe calls for two eggs and a cup of milk")
        loud = gain("STOP that is the most AMAZING thing I have EVER seen!!")
        assert loud > calm + 0.3, (calm, loud)
