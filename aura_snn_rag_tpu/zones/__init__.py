"""Spiking layers, brain zones, and the routing runtime (SURVEY.md §2.4).

The "brain-simulation stack": spiking layer primitives (L2), zone
containers, keyword/liquid/topk routing (L3), event bus, and telemetry.
"""

from aura_snn_rag_tpu.zones.layers import (  # noqa: F401
    SpikingLayer, AdaptiveSpikingLayer, ReservoirLayer, make_layer,
)
from aura_snn_rag_tpu.zones.brain_zone import (  # noqa: F401
    BrainZoneConfig, SpikingNeuronConfig, NeuromorphicBrainZone,
    CorticalRegion,
)
from aura_snn_rag_tpu.zones.events import EventBus, Event  # noqa: F401
from aura_snn_rag_tpu.zones.processor import (  # noqa: F401
    ContentRouter, NeuromorphicProcessor, NeuralPlasticityEngine,
)
from aura_snn_rag_tpu.zones.stats import BrainStats, StatsCollector  # noqa: F401
