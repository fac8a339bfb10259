"""Episodic memory engine (hippocampal formation) — the north-star component.

TPU-native redesign of `/root/reference/src/core/hippocampal.py` (SURVEY.md
§2.1, §3.4): an HBM-resident vector bank with one-shot writes, an IVF-style
centroid index with clustered candidate storage, combined
cosine/spatial/temporal scoring, and incremental k-means rebuilds — all as
pure jittable functions over a static-shape `MemoryState` pytree.
"""

from aura_snn_rag_tpu.memory.state import MemoryState, init_memory_state  # noqa: F401
from aura_snn_rag_tpu.memory.engine import (  # noqa: F401
    write_memories,
    bulk_load,
    retrieve,
    retrieve_bruteforce,
    retrieve_flat,
    retrieve_auto,
    decay_memories,
    rebuild_centroids,
)
from aura_snn_rag_tpu.memory.hippocampus import HippocampalFormation  # noqa: F401
from aura_snn_rag_tpu.memory.sharded import (  # noqa: F401
    init_sharded_memory,
    write_memories_sharded,
    retrieve_sharded,
    rebuild_centroids_sharded,
)
from aura_snn_rag_tpu.memory.cognitive_map import (  # noqa: F401
    CognitiveMapParams,
    init_cognitive_map,
    place_cell_rates,
    grid_cell_rates,
    time_cell_rates,
)
