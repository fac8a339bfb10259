"""Utilities: host array pooling, device memory stats, energy accounting."""

from aura_snn_rag_tpu.utils.memory_utils import (  # noqa: F401
    ArrayPool, get_memory_stats, maybe_defragment,
)
from aura_snn_rag_tpu.utils.energy import EnergyTracker  # noqa: F401
from aura_snn_rag_tpu.utils.trace import StepTimer, annotate, trace  # noqa: F401
