"""Tests for utilities, presets, emotion head, encoders extras, checkpoint."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aura_snn_rag_tpu.encoders.dual_layer_srffn import DualLayerSRFFN
from aura_snn_rag_tpu.encoders.event_encoder import FastEventPatternEncoder
from aura_snn_rag_tpu.encoders.frequency_encoder import (
    FrequencyPatternEncoder, IPA_FORMANTS)
from aura_snn_rag_tpu.models.emotion_head import (
    EmotionHeadConfig, EmotionPersonalityHead, emotion_multitask_loss)
from aura_snn_rag_tpu.ops.izhikevich_presets import (
    IZHIKEVICH_PRESETS, get_preset)
from aura_snn_rag_tpu.ops.neurons import izhikevich_scan
from aura_snn_rag_tpu.utils import ArrayPool, EnergyTracker, get_memory_stats


class TestIzhikevichPresets:
    def test_at_least_23_patterns(self):
        assert len(IZHIKEVICH_PRESETS) >= 23  # README-github.md:17 claim

    def test_fast_spiking_fires_more_than_regular(self):
        x = jnp.ones((1, 500, 1)) * 10.0
        rs, _ = izhikevich_scan(get_preset("regular_spiking"), x)
        fs, _ = izhikevich_scan(get_preset("fast_spiking"), x)
        assert float(fs.sum()) > float(rs.sum())

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            get_preset("not_a_pattern")


class TestEmotionHead:
    def test_multitask_forward_and_loss(self, rng):
        head = EmotionPersonalityHead(EmotionHeadConfig(d_model=32))
        x = jax.random.normal(rng, (4, 32))
        params = head.init(rng, x)
        logits = head.apply(params, x)
        assert set(logits) == {"emotion", "intent", "tone", "personality"}
        labels = {"emotion": jnp.asarray([0, 1, 2, -1]),
                  "intent": jnp.asarray([0, 0, 1, 1]),
                  "tone": jnp.asarray([-1, -1, -1, -1]),
                  "personality": jnp.asarray([0, 1, 2, 3])}
        loss, per_task = emotion_multitask_loss(logits, labels)
        assert jnp.isfinite(loss)
        assert float(per_task["tone"]) == 0.0  # fully masked task


class TestFrequencyEncoder:
    def test_phoneme_patterns_distinct(self):
        enc = FrequencyPatternEncoder(d_model=64)
        p = enc.init_params()
        a = enc.phoneme_pattern(p, "i")
        b = enc.phoneme_pattern(p, "s")
        assert a.shape == (enc.samples,)
        assert not np.array_equal(np.asarray(a), np.asarray(b))

    def test_encode_sequence(self):
        enc = FrequencyPatternEncoder(d_model=32)
        out = enc.encode(enc.init_params(), ["h", "e", "l", "o"])
        assert out.shape == (4, 32)

    def test_formant_table_vowels(self):
        assert IPA_FORMANTS["i"] == (270, 2290)
        assert len(IPA_FORMANTS) >= 25


class TestEventEncoder:
    def test_keyword_extraction(self):
        enc = FastEventPatternEncoder(d_model=32)
        counts = enc.extract_events("I think you should run and think")
        analysis = enc.get_event_analysis("I think you should run")
        assert analysis["cognition"] > 0
        assert analysis["motion"] > 0
        assert counts.sum() == 3  # think ×2 + run

    def test_encode_normalized(self):
        enc = FastEventPatternEncoder(d_model=32)
        v = enc.encode("create and build and design things")
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5

    def test_save_load_roundtrip(self, tmp_path):
        enc = FastEventPatternEncoder(d_model=16)
        p = str(tmp_path / "patterns.npz")
        enc.save(p)
        enc2 = FastEventPatternEncoder(d_model=16, pattern_file=p)
        np.testing.assert_allclose(enc.encode("run fast"),
                                   enc2.encode("run fast"))


class TestDualLayerSRFFN:
    def test_dual_stream_forward(self):
        srffn = DualLayerSRFFN(d_model=32, d_ff=64)
        out = srffn.forward("i love to create art",
                            phonemes=["a", "r", "t"])
        assert out["features"].shape == (64,)
        assert 0 <= out["voice"]["vowel_ratio"] <= 1
        assert out["voice"]["pitch_base"] > 0

    def test_topology(self):
        srffn = DualLayerSRFFN(d_model=16, d_ff=32)
        topo = srffn.get_network_topology()
        assert topo["streams"] == ["semantic", "phonetic"]


class TestUtils:
    def test_array_pool_reuse(self):
        pool = ArrayPool()
        a = pool.get((4, 4))
        pool.put(a)
        b = pool.get((4, 4))
        assert a is b
        assert pool.stats()["hits"] == 1

    def test_memory_stats_shape(self):
        stats = get_memory_stats()
        assert set(stats) >= {"bytes_in_use", "free_ratio"}

    def test_energy_tracker(self):
        t = EnergyTracker()
        spikes = jnp.zeros((2, 4, 8)).at[0, 0, 0].set(1.0)
        t.record("layer", spikes, fan_out=16)
        e = t.energy_pj()["layer"]
        assert e["spike_events"] == 16.0
        assert e["dense_pj"] > e["spiking_pj"]  # sparse spiking wins
