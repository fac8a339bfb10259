"""Brain orchestration tests — mirrors of test_natural_brain /
test_brain_hippocampus_integration semantics (SURVEY §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aura_snn_rag_tpu.models.brain.brain import (
    CentralNervousSystem, EnhancedBrain, LiquidBrain,
    TemporalMemoryInterpolator, fix_neuromorphic_crisis)
from aura_snn_rag_tpu.models.brain.natural_brain import NaturalBrain
from aura_snn_rag_tpu.models.brain.specialist import (
    Specialist, SpecialistRegistry, slugify)
from aura_snn_rag_tpu.services.brain_system import NeuromorphicBrainSystem
from aura_snn_rag_tpu.zones.brain_zone import BrainZoneConfig
from aura_snn_rag_tpu.zones.processor import NeuralPlasticityEngine
from aura_snn_rag_tpu.zones.stats import StatsCollector


class TestNaturalBrain:
    def test_forward_logits_and_info(self, rng):
        brain = NaturalBrain(vocab_size=64, d_model=32, zone_neurons=16,
                             num_experts=2)
        ids = jnp.arange(8).reshape(1, 8)
        params = brain.init(rng, ids)
        logits, info = brain.apply(params, ids, rng=rng)
        assert logits.shape == (1, 64)
        assert jnp.all(jnp.isfinite(logits))
        assert "routing" in info and "emotion" in info
        assert 0.0 <= float(info["emotion"]["arousal"]) <= 1.0

    def test_hormones_change_output(self, rng):
        brain = NaturalBrain(vocab_size=64, d_model=32, zone_neurons=16,
                             num_experts=2)
        ids = jnp.arange(8).reshape(1, 8)
        params = brain.init(rng, ids)
        l0, _ = brain.apply(params, ids, rng=rng)
        l1, _ = brain.apply(params, ids,
                            hormone_levels={"dopamine": 5.0}, rng=rng)
        assert not np.allclose(np.asarray(l0), np.asarray(l1))


class TestEnhancedBrain:
    def test_zone_dispatch(self, rng):
        cfgs = tuple(BrainZoneConfig(name=n, n_neurons=16, input_dim=16,
                                     output_dim=16)
                     for n in ("a", "b", "c"))
        brain = EnhancedBrain(cfgs, d_model=16)
        x = jax.random.normal(rng, (2, 16))
        vars_ = brain.init(rng, x)
        (out, info), _ = brain.apply(vars_, x, mutable=["constants"])
        assert out.shape == (2, 16)
        assert set(info["zone_stats"]) == {"a", "b", "c"}


class TestLiquidBrain:
    def test_online_learning_reduces_error(self):
        lb = LiquidBrain(input_dim=64, n_components=8, max_components=32,
                         n_experts=2)
        errs = []
        for i in range(40):
            r = lb.learn_text(f"sample text number {i % 4}",
                              target=float(i % 4))
            errs.append(abs(r["error"]))
        assert np.mean(errs[-10:]) < np.mean(errs[:10])
        assert r["consciousness"] in ("calm", "alert", "stressed",
                                      "overwhelmed")


class TestCNS:
    def test_stress_dynamics(self):
        cns = CentralNervousSystem(stress_alpha=0.5)
        for _ in range(10):
            h = cns.update(5.0)
        assert cns.consciousness in ("stressed", "overwhelmed")
        assert h["cortisol"] > 0
        for _ in range(20):
            h = cns.update(0.0)
        assert cns.consciousness in ("calm", "alert")


class TestInterpolator:
    def test_all_modes_run(self):
        interp = TemporalMemoryInterpolator()
        a = np.sin(np.linspace(0, 4, 64)).astype(np.float32)
        b = np.cos(np.linspace(0, 4, 64)).astype(np.float32)
        for mode in TemporalMemoryInterpolator.MODES:
            out = interp.interpolate(a, b, 0.5, mode)
            assert out.shape == (64,)
            assert np.all(np.isfinite(out))

    def test_linear_endpoints(self):
        interp = TemporalMemoryInterpolator()
        a, b = np.zeros(8, np.float32), np.ones(8, np.float32)
        np.testing.assert_allclose(interp.interpolate(a, b, 0.0, "linear"), a)
        np.testing.assert_allclose(interp.interpolate(a, b, 1.0, "linear"), b)


class TestSpecialists:
    def test_slug_and_registry(self):
        assert slugify("Quantum Physics!") == "quantum-physics"
        reg = SpecialistRegistry(in_dim=8)
        reg.ensure_from_topics(["Math", "History", "Math"])
        assert len(reg) == 2
        assert "math" in reg

    def test_specialist_learns(self):
        s = Specialist("test", in_dim=4)
        rng = np.random.RandomState(0)
        w = rng.randn(4).astype(np.float32)
        for _ in range(300):
            x = rng.randn(4).astype(np.float32)
            s.update(x, float(w @ x))
        x = rng.randn(4).astype(np.float32)
        assert abs(s.predict(x) - w @ x) < 0.5


class TestBrainSystem:
    def test_end_to_end_text_processing(self):
        system = NeuromorphicBrainSystem(d_model=32, n_neurons=16)
        out, info = system.process_text("remember to analyze the pattern")
        assert jnp.all(jnp.isfinite(out))
        assert len(info["plan"]) >= 1
        health = system.get_health()
        assert health["memory_count"] == 0
        assert len(health["zones"]) == 8

    def test_crisis_repair(self):
        eng = NeuralPlasticityEngine()
        sc = StatsCollector()
        sc.update_firing_rates({"hot": 0.9, "ok": 0.1})
        sc.commit(0)
        result = fix_neuromorphic_crisis(eng, sc)
        assert "hot" in result["repaired_zones"]
        assert "ok" not in result["repaired_zones"]
