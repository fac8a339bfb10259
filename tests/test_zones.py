"""Brain-simulation substrate tests: spiking layers, zones, routing,
events, stats — mirrors of test_snn_zones / test_thalamic_routing_spiking /
processor semantics (SURVEY §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aura_snn_rag_tpu.ops.maths import (
    addition_linear, additive_receptance, sign_activation, softmax_np)
from aura_snn_rag_tpu.zones import (
    AdaptiveSpikingLayer, BrainZoneConfig, ContentRouter, CorticalRegion,
    Event, EventBus, NeuralPlasticityEngine, NeuromorphicBrainZone,
    NeuromorphicProcessor, ReservoirLayer, SpikingLayer, SpikingNeuronConfig,
    StatsCollector, make_layer,
)


class TestMaths:
    def test_addition_linear_is_l1(self):
        x = jnp.asarray([[1.0, 2.0]])
        w = jnp.asarray([[1.0, 2.0], [0.0, 0.0]])
        out = addition_linear(x, w)
        np.testing.assert_allclose(out, [[0.0, -3.0]])

    def test_sign_activation_ste(self):
        g = jax.grad(lambda x: jnp.sum(sign_activation(x)))(
            jnp.asarray([0.2, 5.0]))
        np.testing.assert_allclose(g, [0.8, 0.0], atol=1e-6)

    def test_softmax_np(self):
        p = softmax_np(np.asarray([1.0, 1.0]))
        np.testing.assert_allclose(p, [0.5, 0.5], atol=1e-9)


class TestSpikingLayers:
    def test_spiking_layer(self, rng):
        layer = SpikingLayer(features=16)
        x = jax.random.normal(rng, (2, 4, 8)) * 2
        vars_ = layer.init(rng, x)
        (spikes, stats), _ = layer.apply(vars_, x, mutable=["constants"])
        assert spikes.shape == (2, 4, 16)
        assert 0.0 <= float(stats["firing_rate"]) <= 1.0

    def test_adaptive_layer_homeostasis(self, rng):
        layer = AdaptiveSpikingLayer(features=8, target_rate=0.1,
                                     adapt_rate=0.5)
        x = jnp.ones((1, 6, 4)) * 3.0  # strong drive → rate above target
        vars_ = layer.init(rng, x)
        (spikes, thr, stats), _ = layer.apply(vars_, x,
                                              mutable=["constants"])
        assert float(stats["firing_rate"]) > 0.1
        assert float(thr.mean()) > 0.6  # thresholds rose toward homeostasis

    def test_reservoir_layer(self, rng):
        layer = ReservoirLayer(features=32)
        x = jax.random.normal(rng, (2, 10, 8))
        vars_ = layer.init(rng, x)
        (readout, final), _ = layer.apply(vars_, x, mutable=["constants"])
        assert readout.shape == (2, 10, 32)
        assert final.shape == (2, 32)
        assert jnp.all(jnp.isfinite(readout))

    def test_factory(self):
        assert isinstance(make_layer("spiking", 8), SpikingLayer)
        assert isinstance(make_layer("reservoir", 8), ReservoirLayer)
        with pytest.raises(ValueError):
            make_layer("bogus", 8)


class TestBrainZone:
    def test_mixed_population_zone(self, rng):
        cfg = BrainZoneConfig(
            name="test", n_neurons=32, input_dim=16, output_dim=8,
            neuron_configs=(
                SpikingNeuronConfig("lif", percentage=0.5),
                SpikingNeuronConfig("izhikevich", percentage=0.5)),
            timesteps=4)
        zone = NeuromorphicBrainZone(cfg)
        x = jax.random.normal(rng, (2, 16))
        vars_ = zone.init(rng, x)
        (out, stats), _ = zone.apply(vars_, x, mutable=["constants"])
        assert out.shape == (2, 8)
        assert jnp.isfinite(stats["avg_firing_rate"])

    def test_cortical_region_normalized(self, rng):
        cfg = BrainZoneConfig(n_neurons=16, input_dim=8, output_dim=8)
        region = CorticalRegion(cfg)
        x = jax.random.normal(rng, (4, 8))
        vars_ = region.init(rng, x)
        (out, _), _ = region.apply(vars_, x, mutable=["constants"])
        # LayerNormed output: per-row mean ≈ 0
        np.testing.assert_allclose(np.asarray(out.mean(axis=-1)), 0.0,
                                   atol=1e-4)


class TestRouting:
    def test_keyword_routing(self):
        router = ContentRouter()
        zones = router.route_text_to_zones("please remember this memory")
        assert zones[0] in ("hippocampus", "temporal_cortex")
        zones2 = router.route_text_to_zones("calculate the statistics")
        assert "prefrontal_cortex" in zones2

    def test_external_lexicon(self, tmp_path):
        d = tmp_path / "lex"
        d.mkdir()
        (d / "emotion_words.txt").write_text("joyful tearful")
        router = ContentRouter()
        n = router.load_lexicon_dir(str(d))
        assert n == 2
        assert router.route_text_to_zones("joyful day")[0] == "amygdala"

    def test_processor_plan_and_run(self):
        proc = NeuromorphicProcessor(d_model=8)
        ran = []

        def make_zone(name):
            def fwd(x):
                ran.append(name)
                return x * 2.0, {"avg_firing_rate": 0.1}
            return fwd
        for z in ("prefrontal_cortex", "hippocampus", "cerebellum"):
            proc.register_zone(z, make_zone(z))
        plan = proc.build_plan("remember the past analyze it", top_k=2)
        assert 1 <= len(plan) <= 2
        assert {z for z, _ in plan} <= {"prefrontal_cortex", "hippocampus",
                                        "cerebellum"}
        out, info = proc.run_plan(jnp.ones((1, 8)), "remember the past")
        assert out.shape == (1, 8)
        assert ran  # zones executed

    def test_processor_liquid_mode(self):
        proc = NeuromorphicProcessor(d_model=8, router_mode="liquid")
        proc.register_zone("a", lambda x: (x, {}))
        proc.register_zone("b", lambda x: (x * 2, {}))
        plan = proc.build_plan(embedding=np.ones(8, np.float32), top_k=2)
        assert len(plan) == 2

    def test_zone_failure_skipped(self):
        proc = NeuromorphicProcessor(d_model=4)

        def bad(x):
            raise RuntimeError("boom")
        proc.register_zone("prefrontal_cortex", bad)
        proc.register_zone("hippocampus", lambda x: (x, {}))
        out, _ = proc.run_plan(jnp.ones((1, 4)), "remember analyze")
        assert proc.stats["errors"] == 1
        assert jnp.all(jnp.isfinite(out))

    def test_plasticity_engine(self):
        eng = NeuralPlasticityEngine(target_rate=0.1, nudge=0.1)
        eng.register_zone("z", 4)
        bias = eng.update("z", firing_rate=0.0)  # silent → bias up
        assert (bias > 0).all()
        bias = eng.update("z", firing_rate=0.9)  # saturated → bias down
        assert (bias < 0.01).all()


class TestEvents:
    def test_pubsub(self):
        bus = EventBus()
        seen = []
        bus.subscribe("neuron_fired", lambda e: seen.append(e.data["zone"]))
        bus.emit("neuron_fired", zone="z1")
        assert seen == ["z1"]

    def test_handler_exception_swallowed(self):
        bus = EventBus()
        bus.subscribe("neuron_fired", lambda e: 1 / 0)
        bus.emit("neuron_fired")
        assert bus.error_count == 1


class TestStats:
    def test_stability_classification(self):
        sc = StatsCollector()
        assert sc.classify_stability([5.0, 4.0, 3.0, 2.0]) == "improving"
        assert sc.classify_stability([2.0, 2.0, 2.0, 2.0]) == "stable"
        assert sc.classify_stability([1.0, 2.0, 4.0, 8.0]) == "diverging"
        assert sc.classify_stability([1.0, float("nan"), 1.0, 1.0]) \
            == "diverging"

    def test_recommendations_and_roundtrip(self, tmp_path):
        sc = StatsCollector()
        sc.update_firing_rates({"silent_zone": 0.001, "hot_zone": 0.9})
        sc.classify_stability([1.0, 1.0, 1.0, 1.0])
        sc.commit(step=1)
        recs = sc.get_recommendations()
        assert any("silent" in r for r in recs)
        assert any("saturated" in r for r in recs)
        p = tmp_path / "stats.json"
        sc.save(str(p))
        sc2 = StatsCollector()
        sc2.load(str(p))
        assert len(sc2.history) == 1
        assert sc2.history[0].zone_firing_rates["hot_zone"] == 0.9


class TestLiveTelemetry:
    """Deepened telemetry (VERDICT r1 weak #6): membrane stats from real
    zone forwards, zone health bands, health summary heuristics
    (snn_brain_stats.py:204-392 parity)."""

    def test_zone_forward_reports_membrane_stats(self):
        import jax
        import jax.numpy as jnp
        from aura_snn_rag_tpu.zones.brain_zone import (
            BrainZoneConfig, NeuromorphicBrainZone, SpikingNeuronConfig)
        zone = NeuromorphicBrainZone(BrainZoneConfig(
            n_neurons=32, input_dim=16, output_dim=16,
            neuron_configs=(SpikingNeuronConfig("lif", 0.5),
                            SpikingNeuronConfig("izhikevich", 0.5)),
            timesteps=2))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
        params = zone.init(jax.random.PRNGKey(1), x)
        out, stats = zone.apply(params, x)
        assert "membrane_mean" in stats and "membrane_std" in stats
        import numpy as np
        assert np.isfinite(float(stats["membrane_mean"]))
        assert float(stats["membrane_std"]) >= 0

    def test_collector_zone_activity_and_health(self):
        from aura_snn_rag_tpu.zones.stats import StatsCollector
        c = StatsCollector()
        c.update_zone_activity("visual", {
            "avg_firing_rate": 0.2, "membrane_mean": -0.1,
            "membrane_std": 0.4})
        c.update_zone_activity("silent_zone", {"avg_firing_rate": 0.0})
        c.update_zone_activity("hyper_zone", {"avg_firing_rate": 0.95})
        status = c.zone_health_status()
        assert status["visual"] == "healthy"
        assert status["silent_zone"] == "silent"
        assert status["hyper_zone"] == "hyperactive"
        assert c.current.membrane_stats["visual_mean"] == -0.1

        summary = c.health_summary()
        assert summary["overall_health"] == "concerning"
        assert any("silent" in s for s in summary["concerns"])
        assert any("hyperactive" in s for s in summary["concerns"])

    def test_grad_health_total_and_stability_history(self):
        import jax.numpy as jnp
        from aura_snn_rag_tpu.zones.stats import StatsCollector
        c = StatsCollector()
        grads = {"params": {"layer0": {"kernel": jnp.full((4, 4), 1e3)}}}
        c.update_grad_health(grads)
        assert c.current.grad_health["__total__"] > 100
        assert c.stability_history[-1] == "exploding"
        recs = c.get_recommendations()
        assert any("exploding" in r for r in recs)

    def test_processor_feeds_collector(self):
        import jax.numpy as jnp
        from aura_snn_rag_tpu.zones.processor import NeuromorphicProcessor
        from aura_snn_rag_tpu.zones.stats import StatsCollector
        collector = StatsCollector()
        proc = NeuromorphicProcessor(d_model=8, stats_collector=collector)
        proc.register_zone(
            "language",
            lambda x: (x, {"avg_firing_rate": 0.12,
                           "membrane_mean": 0.01, "membrane_std": 0.2}))
        out, info = proc.run_plan(jnp.ones((2, 8)), text="hello words")
        assert collector.current.zone_firing_rates.get("language") == 0.12
        assert "language_mean" in collector.current.membrane_stats
