"""MemoryState: the episodic memory bank as an explicit static-shape pytree.

Replaces the reference's stateful `nn.Module` buffers + Python-side dicts
(/root/reference/src/core/hippocampal.py:84-118) with a functional pytree
threaded through jitted update functions (SURVEY.md §7.1). Key deviations
from the reference, by design:

- wall-clock timestamps → logical step clock (`step`), deterministic and
  resume-safe (fixes SURVEY §2.11 nondeterminism);
- Python id↔idx dicts → dense device indices; string ids live only at the
  host API edge (`hippocampus.HippocampalFormation`);
- ragged per-centroid candidate lists → static [K, C] bucketed layout plus an
  IVF-style *clustered feature store* `clustered [K, C, D]` holding
  L2-normalized copies of member vectors, so a query reads P contiguous
  [C, D] blocks from HBM instead of scattering across the bank
  (SURVEY §7.3 "bucketed layout" hard-part resolution);
- stale-entry correctness after FIFO overwrite: every write stamps a
  generation (`slot_gen[bank_idx]` and `cluster_gen[K, C]`); a cluster entry
  is valid iff its generation matches the bank slot's current generation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from aura_snn_rag_tpu.config import MemoryConfig


class MemoryState(NamedTuple):
    """Episodic memory bank + centroid index. All shapes static."""

    # --- bank (row-indexed by bank slot) ---
    features: jax.Array       # [M, D] f32 raw stored features
    features_nb16: jax.Array  # [M, D] bf16 L2-normalized copy (flat-scan path)
    coarse_scale: jax.Array   # [M] f32 per-row dequant scale of the coarse
                              #   copy. int8 banks quantize each row by its
                              #   own max-abs (full +-127 range: components
                              #   of an L2-normalized 768-dim row are
                              #   ~1/sqrt(D)~0.036, so a global 127 scale
                              #   would use only ~+-5 levels); dequantized
                              #   cos = acc * coarse_scale / 127. bf16
                              #   banks keep 1.0 (plain cast).
    locations: jax.Array      # [M, S] f32 spatial coordinates at write time
    strength: jax.Array       # [M]    f32 decayable strength (init 1.0)
    timestamp: jax.Array      # [M]    f32 logical step at write
    centroid_id: jax.Array    # [M]    i32 assigned centroid (-1 = none)
    slot_gen: jax.Array       # [M]    i32 write generation of the slot

    # --- centroid index ---
    centroids: jax.Array      # [K, D] f32
    centroid_counts: jax.Array  # [K]  f32 members per centroid (for eta=1/n)

    # --- IVF clustered candidate store ---
    # All per-candidate scoring metadata lives cluster-aligned so a query
    # touches only contiguous [C]-blocks (no scattered per-entry gathers):
    clustered: jax.Array      # [K, C, D] bf16 L2-normalized member copies
    cluster_slot: jax.Array   # [K, C] i32 bank slot of each entry (-1 = empty)
    cluster_gen: jax.Array    # [K, C] i32 generation stamp of each entry
    cluster_ts: jax.Array     # [K, C] f32 write timestamp (logical step)
    cluster_decay: jax.Array  # [K, C] f32 decay_accum at write (strength =
                              #   exp(decay_accum - cluster_decay))
    cluster_loc: jax.Array    # [K, C, S] f32 write locations
    bucket_fill: jax.Array    # [K]    i32 ring write cursor per bucket

    # --- scalars ---
    count: jax.Array          # i32 total writes ever (active rows = min(count, M))
    step: jax.Array           # f32 logical clock
    decay_accum: jax.Array    # f32 cumulative log(1-rate) of all decays
    index_ready: jax.Array    # bool centroid index usable

    @property
    def max_memories(self) -> int:
        return self.features.shape[0]

    @property
    def feature_dim(self) -> int:
        return self.features.shape[1]

    @property
    def k_centroids(self) -> int:
        return self.centroids.shape[0]

    @property
    def bucket_capacity(self) -> int:
        return self.clustered.shape[1]

    def active_count(self) -> jax.Array:
        return jnp.minimum(self.count, self.max_memories)


def init_memory_state(config: MemoryConfig, dtype=jnp.float32,
                      clustered_dtype=jnp.bfloat16) -> MemoryState:
    M, D, S = config.max_memories, config.feature_dim, config.spatial_dims
    K, C = config.k_centroids, config.bucket_capacity
    # flat-scan bank copy: bf16, or int8 (127-scaled) when
    # config.coarse_dtype == "int8" — field name kept for checkpoint
    # structure stability
    coarse_dtype = (jnp.int8 if config.coarse_dtype == "int8"
                    else clustered_dtype)
    return MemoryState(
        features=jnp.zeros((M, D), dtype),
        features_nb16=jnp.zeros((M, D), coarse_dtype),
        coarse_scale=jnp.ones((M,), jnp.float32),
        locations=jnp.zeros((M, S), dtype),
        strength=jnp.zeros((M,), dtype),
        timestamp=jnp.zeros((M,), dtype),
        centroid_id=jnp.full((M,), -1, jnp.int32),
        slot_gen=jnp.full((M,), -1, jnp.int32),
        centroids=jnp.zeros((K, D), dtype),
        centroid_counts=jnp.zeros((K,), dtype),
        clustered=jnp.zeros((K, C, D), clustered_dtype),
        cluster_slot=jnp.full((K, C), -1, jnp.int32),
        cluster_gen=jnp.full((K, C), -1, jnp.int32),
        cluster_ts=jnp.zeros((K, C), dtype),
        cluster_decay=jnp.zeros((K, C), dtype),
        cluster_loc=jnp.zeros((K, C, S), dtype),
        bucket_fill=jnp.zeros((K,), jnp.int32),
        count=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), dtype),
        decay_accum=jnp.zeros((), dtype),
        index_ready=jnp.zeros((), jnp.bool_),
    )
