"""NeuromorphicBrainSystem: the service facade wiring everything together.

Parity with `NeuromorphicBrainSystem`
(/root/reference/src/services/brain_system.py:41-…): EventBus +
NeuromorphicProcessor + default zones + optional continuous-learning
orchestrator in one object (RSS off by default :56).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.config import MemoryConfig
from aura_snn_rag_tpu.memory.hippocampus import HippocampalFormation
from aura_snn_rag_tpu.services.continuous_learning import (
    ContinuousLearningOrchestrator)
from aura_snn_rag_tpu.zones.brain_zone import (
    BrainZoneConfig, NeuromorphicBrainZone, SpikingNeuronConfig)
from aura_snn_rag_tpu.zones.events import EventBus
from aura_snn_rag_tpu.zones.processor import (
    NeuralPlasticityEngine, NeuromorphicProcessor)
from aura_snn_rag_tpu.zones.stats import StatsCollector

DEFAULT_ZONES = (
    ("prefrontal_cortex", {"reasoning", "planning"}),
    ("temporal_cortex", {"language", "audio"}),
    ("hippocampus", {"memory"}),
    ("parietal_cortex", {"spatial", "integration"}),
    ("occipital_cortex", {"visual"}),
    ("cerebellum", {"timing", "coordination"}),
    ("amygdala", {"emotion"}),
    ("insular_cortex", {"interoception"}),
)


class NeuromorphicBrainSystem:
    """Wired brain service: zones + routing + memory + optional CL feeds."""

    def __init__(self, d_model: int = 64, n_neurons: int = 64,
                 memory_config: Optional[MemoryConfig] = None,
                 enable_rss: bool = False, seed: int = 0):
        self.d_model = d_model
        self.event_bus = EventBus()
        self.processor = NeuromorphicProcessor(
            d_model=d_model, event_bus=self.event_bus)
        self.plasticity = NeuralPlasticityEngine(event_bus=self.event_bus)
        self.stats = StatsCollector()
        self.hippocampus = HippocampalFormation(
            memory_config or MemoryConfig(
                max_memories=4096, feature_dim=d_model, k_centroids=32,
                n_place_cells=64, n_grid_cells=16, n_time_cells=8),
            seed=seed)

        self._zone_params: Dict[str, Any] = {}
        self._zone_modules: Dict[str, NeuromorphicBrainZone] = {}
        key = jax.random.PRNGKey(seed)
        for name, caps in DEFAULT_ZONES:
            key, sub = jax.random.split(key)
            cfg = BrainZoneConfig(
                name=name, n_neurons=n_neurons, input_dim=d_model,
                output_dim=d_model,
                neuron_configs=(SpikingNeuronConfig("lif"),))
            module = NeuromorphicBrainZone(cfg)
            variables = module.init(sub, jnp.zeros((1, d_model)))
            self._zone_modules[name] = module
            self._zone_params[name] = variables
            self.plasticity.register_zone(name, n_neurons)
            self.processor.register_zone(
                name, self._make_forward(name), caps)

        feeds = None
        if enable_rss:
            from aura_snn_rag_tpu.services.continuous_learning import (
                create_default_feeds)
            feeds = create_default_feeds()
        self.orchestrator = ContinuousLearningOrchestrator(
            self.hippocampus, feeds=feeds, memory_only=False,
            zone_executor=self._execute_zone_plan)

        self.event_bus.emit("brain_created", zones=len(self._zone_modules))

    def _make_forward(self, name: str):
        def forward(x):
            module = self._zone_modules[name]
            homeo = jnp.asarray(self.plasticity.homeo_i[name])
            (out, zstats), _ = module.apply(
                self._zone_params[name], jnp.atleast_2d(x), homeo,
                mutable=["constants"])
            self.stats.update_firing_rates(
                {name: float(zstats["avg_firing_rate"])})
            return out, zstats
        return forward

    def _execute_zone_plan(self, features: np.ndarray, category: str):
        out, info = self.processor.run_plan(
            jnp.asarray(features)[None, :], text=category,
            embedding=np.asarray(features[:self.d_model], np.float32))
        self.event_bus.emit("content_processed", category=category)
        return out, info

    def process_text(self, text: str, features: Optional[np.ndarray] = None):
        """Route a text (with optional feature vector) through the zones."""
        if features is None:
            features = self.orchestrator.hash_embedder.embed(text)[
                :self.d_model]
        return self.processor.run_plan(
            jnp.asarray(features, jnp.float32)[None, :], text=text)

    def get_health(self) -> Dict[str, Any]:
        return {
            "zones": list(self._zone_modules),
            "memory_count": self.hippocampus.memory_count,
            "processor_stats": self.processor.get_stats(),
            "recommendations": (self.processor.get_recommendations()
                                + self.stats.get_recommendations()),
        }
