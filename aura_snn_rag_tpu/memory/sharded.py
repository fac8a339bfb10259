"""Multi-chip episodic memory: bank sharded over one or more mesh axes.

No reference equivalent (the reference is single-device; SURVEY §2.8 / §5.7
prescribe this design): each device owns an independent shard of the bank —
its own rows, centroids, and buckets — writes go to the local shard
(data-parallel batches write where they live), and queries run per-shard
top-k followed by an `all_gather` candidate merge over ICI, exactly the
"per-shard top-k + all-gather" plan from BASELINE.json's north star.

Implementation: per-shard `MemoryState`s stacked on a leading axis [S, ...];
`shard_map` gives each device its [1, ...] slice; the pure single-shard
engine functions from `memory.engine` run unchanged inside.

Multi-slice (DCN) scaling: pass `axis=("replica", "data")` — the bank
shards over the flattened (slice, within-slice) grid and retrieval merges
HIERARCHICALLY: per-shard top-k → all_gather + merge over the inner axis
(ICI, cheap) → all_gather + merge of only the k survivors per slice over
the outer axis (DCN, expensive — traffic is k·(D+2) per slice instead of
S_ici·k·(D+2)). Writes stay slice-local, so no DCN traffic on the write
path at all. See `parallel.distributed.multislice_mesh`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aura_snn_rag_tpu.config import MemoryConfig
from aura_snn_rag_tpu.memory import engine
from aura_snn_rag_tpu.memory.engine import RetrievalResult
from aura_snn_rag_tpu.memory.state import MemoryState, init_memory_state


def _axes(axis) -> Tuple[str, ...]:
    return (axis,) if isinstance(axis, str) else tuple(axis)


def init_sharded_memory(config: MemoryConfig, mesh: Mesh,
                        axis="data") -> MemoryState:
    """Stacked per-shard states [S, ...], placed shard-per-device.

    `config.max_memories` is the PER-SHARD capacity; total capacity is
    S × max_memories. `axis` may be a single mesh axis name or a tuple
    (outer→inner, e.g. ("replica", "data") for multi-slice DCN×ICI).
    """
    axes = _axes(axis)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    single = init_memory_state(config)
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape), single)
    sharding = NamedSharding(mesh, P(axes))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)


def _squeeze(state: MemoryState) -> MemoryState:
    return jax.tree.map(lambda x: x[0], state)


def _unsqueeze(state: MemoryState) -> MemoryState:
    return jax.tree.map(lambda x: x[None], state)


def write_memories_sharded(config: MemoryConfig, mesh: Mesh,
                           state: MemoryState, features: jax.Array,
                           locations: jax.Array,
                           axis="data") -> MemoryState:
    """Batched write: the [B, D] batch is sharded over `axis`; each shard
    writes its local B/S rows into its local bank (slice-local on a
    multi-slice mesh: zero DCN traffic)."""
    axes = _axes(axis)

    def local_write(st, f, loc):
        return _unsqueeze(engine.write_memories.__wrapped__(
            config, _squeeze(st), f, loc))

    fn = jax.shard_map(
        local_write, mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes)),
        out_specs=P(axes))
    return fn(state, features, locations)


def rebuild_centroids_sharded(config: MemoryConfig, mesh: Mesh,
                              state: MemoryState, key: jax.Array,
                              axis="data") -> MemoryState:
    """Per-shard index rebuild (independent local k-means)."""
    axes = _axes(axis)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    keys = jax.random.split(key, n)

    def local_rebuild(st, k):
        # unrolled_spill: a lax.scan carry trips shard_map's varying-axes
        # typing, so the per-shard rebuild keeps the unrolled spill loop
        return _unsqueeze(engine.rebuild_centroids.__wrapped__(
            config, _squeeze(st), k[0], True))

    fn = jax.shard_map(
        local_rebuild, mesh=mesh,
        in_specs=(P(axes), P(axes)),
        out_specs=P(axes))
    return fn(state, keys)


def _merge_topk(scores, slots, feats, k, ax):
    """all_gather candidates over `ax` and keep the global top-k."""
    all_scores = jax.lax.all_gather(scores, ax)      # [S, B, k']
    all_slots = jax.lax.all_gather(slots, ax)
    all_feats = jax.lax.all_gather(feats, ax)
    S, B, K_ = all_scores.shape
    flat_scores = jnp.moveaxis(all_scores, 0, 1).reshape(B, S * K_)
    flat_slots = jnp.moveaxis(all_slots, 0, 1).reshape(B, S * K_)
    flat_feats = jnp.moveaxis(all_feats, 0, 1).reshape(B, S * K_, -1)
    masked = jnp.where(flat_slots >= 0, flat_scores, -jnp.inf)
    top_scores, pick = jax.lax.top_k(masked, k)
    return (top_scores,
            jnp.take_along_axis(flat_slots, pick, axis=1),
            jnp.take_along_axis(flat_feats, pick[..., None], axis=1))


def retrieve_sharded(config: MemoryConfig, mesh: Mesh, state: MemoryState,
                     queries: jax.Array, k: int = 5,
                     axis="data") -> RetrievalResult:
    """Batched retrieval over all shards.

    queries [B, D] (replicated); per shard: local IVF/brute top-k for every
    query, then a hierarchical candidate merge: innermost axis first (ICI
    all_gather of [B, k] survivors), outer axes after (DCN sees only the k
    winners per slice, not S_ici·k). Returned slot ids are globalized as
    flat_shard_idx * max_memories + local_slot (outer-major flat index,
    matching the [S, ...] stacking order of `init_sharded_memory`).
    """
    M = config.max_memories
    axes = _axes(axis)

    def local_retrieve(st, q):
        st = _squeeze(st)
        res = engine.retrieve_auto(config, st, q, None, k)
        shard = 0
        for a in axes:                        # outer-major flat index
            shard = shard * mesh.shape[a] + jax.lax.axis_index(a)
        gslots = jnp.where(res.indices >= 0,
                           res.indices + shard * M, -1)
        scores, slots, feats = res.scores, gslots, res.features
        for a in reversed(axes):              # inner (ICI) merge first
            scores, slots, feats = _merge_topk(scores, slots, feats, k, a)
        hit = jnp.isfinite(scores)
        return RetrievalResult(
            jnp.where(hit, slots, -1),
            jnp.where(hit, scores, 0.0),
            jnp.where(hit[..., None], feats, 0.0))

    fn = jax.shard_map(
        local_retrieve, mesh=mesh,
        in_specs=(P(axes), P()),
        out_specs=P(),          # identical on all shards → replicated
        check_vma=False)
    return fn(state, queries)


def decay_memories_sharded(state: MemoryState,
                           decay_rate: float = 0.01) -> MemoryState:
    """Decay is elementwise — no shard_map needed.

    Delegates to `engine.decay_memories` so BOTH `strength` and
    `decay_accum` advance together: the IVF coarse path reconstructs
    strength as exp(decay_accum − cluster_decay) (engine.py), so decaying
    strength alone would corrupt sharded IVF candidate rankings.
    """
    return engine.decay_memories(state, decay_rate)
