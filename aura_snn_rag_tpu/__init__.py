"""aura_snn_rag_tpu — TPU-native rebuild of the aura-snn-rag neuromorphic LM framework.

A JAX/XLA/Pallas/pjit implementation of the reference system's capabilities
(see /root/repo/SURVEY.md for the blueprint):

- Episodic memory engine: HBM-resident vector bank with one-shot writes,
  centroid (IVF-style) index, combined cosine/spatial/temporal scoring,
  incremental k-means rebuilds.  (`aura_snn_rag_tpu.memory`)
- Hippocampal transformer LM: sparse place-cell token coding, theta-gamma
  positional encoding, prosody/memory-gated causal attention, spiking
  GIF-neuron FFNs.  (`aura_snn_rag_tpu.models`)
- Spiking substrate: LIF/Izhikevich/AdEx/GIF neurons with custom-VJP
  surrogate gradients as `lax.scan` kernels.  (`aura_snn_rag_tpu.ops`)
- Brain modulators: amygdala, endocrine, thalamus, basal ganglia,
  Liquid-MoE routing.  (`aura_snn_rag_tpu.models.brain`)
- Training: wake/sleep replay, EWC, cosine schedules, Orbax checkpointing,
  pjit/GSPMD data+tensor parallel over a device mesh.
  (`aura_snn_rag_tpu.training`, `aura_snn_rag_tpu.parallel`)
"""

__version__ = "0.1.0"

from aura_snn_rag_tpu import _cache  # noqa: F401  (persistent XLA cache)
from aura_snn_rag_tpu.config import (  # noqa: F401
    MemoryConfig,
    ModelConfig,
    TrainingConfig,
    MeshConfig,
    AuraConfig,
    get_test_config,
    get_small_config,
    get_medium_config,
    get_full_config,
)
