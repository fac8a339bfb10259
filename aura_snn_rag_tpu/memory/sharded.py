"""Multi-chip episodic memory: bank sharded over the mesh 'data' axis.

No reference equivalent (the reference is single-device; SURVEY §2.8 / §5.7
prescribe this design): each device owns an independent shard of the bank —
its own rows, centroids, and buckets — writes go to the local shard
(data-parallel batches write where they live), and queries run per-shard
top-k followed by an `all_gather` candidate merge over ICI, exactly the
"per-shard top-k + all-gather" plan from BASELINE.json's north star.

Implementation: per-shard `MemoryState`s stacked on a leading axis [S, ...];
`shard_map` gives each device its [1, ...] slice; the pure single-shard
engine functions from `memory.engine` run unchanged inside.
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


def init_sharded_memory(config: MemoryConfig, mesh: Mesh,
                        axis: str = "data") -> MemoryState:
    """Stacked per-shard states [S, ...], placed shard-per-device.

    `config.max_memories` is the PER-SHARD capacity; total capacity is
    S × max_memories.
    """
    n = mesh.shape[axis]
    single = init_memory_state(config)
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape), single)
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)


def _squeeze(state: MemoryState) -> MemoryState:
    return jax.tree.map(lambda x: x[0], state)


def _unsqueeze(state: MemoryState) -> MemoryState:
    return jax.tree.map(lambda x: x[None], state)


def write_memories_sharded(config: MemoryConfig, mesh: Mesh,
                           state: MemoryState, features: jax.Array,
                           locations: jax.Array,
                           axis: str = "data") -> MemoryState:
    """Batched write: the [B, D] batch is sharded over `axis`; each shard
    writes its local B/S rows into its local bank."""

    def local_write(st, f, loc):
        return _unsqueeze(engine.write_memories.__wrapped__(
            config, _squeeze(st), f, loc))

    fn = jax.shard_map(
        local_write, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis))
    return fn(state, features, locations)


def rebuild_centroids_sharded(config: MemoryConfig, mesh: Mesh,
                              state: MemoryState, key: jax.Array,
                              axis: str = "data") -> MemoryState:
    """Per-shard index rebuild (independent local k-means)."""
    n = mesh.shape[axis]
    keys = jax.random.split(key, n)

    def local_rebuild(st, k):
        return _unsqueeze(engine.rebuild_centroids.__wrapped__(
            config, _squeeze(st), k[0]))

    fn = jax.shard_map(
        local_rebuild, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis))
    return fn(state, keys)


def retrieve_sharded(config: MemoryConfig, mesh: Mesh, state: MemoryState,
                     queries: jax.Array, k: int = 5,
                     axis: str = "data") -> RetrievalResult:
    """Batched retrieval over all shards.

    queries [B, D] (replicated); per shard: local IVF/brute top-k for every
    query → all_gather of (scores, features, global slot ids) over ICI →
    global top-k merge. Returned slot ids are globalized as
    shard_idx * max_memories + local_slot.
    """
    M = config.max_memories

    def local_retrieve(st, q):
        st = _squeeze(st)
        res = engine.retrieve_auto(config, st, q, None, k)
        shard = jax.lax.axis_index(axis)
        gslots = jnp.where(res.indices >= 0,
                           res.indices + shard * M, -1)
        # gather candidates from every shard: [S, B, k]
        all_scores = jax.lax.all_gather(res.scores, axis)
        all_slots = jax.lax.all_gather(gslots, axis)
        all_feats = jax.lax.all_gather(res.features, axis)

        S, B, K_ = all_scores.shape
        flat_scores = jnp.moveaxis(all_scores, 0, 1).reshape(B, S * K_)
        flat_slots = jnp.moveaxis(all_slots, 0, 1).reshape(B, S * K_)
        flat_feats = jnp.moveaxis(all_feats, 0, 1).reshape(B, S * K_, -1)

        masked = jnp.where(flat_slots >= 0, flat_scores, -jnp.inf)
        top_scores, pick = jax.lax.top_k(masked, k)
        top_slots = jnp.take_along_axis(flat_slots, pick, axis=1)
        top_feats = jnp.take_along_axis(
            flat_feats, pick[..., None], axis=1)
        hit = jnp.isfinite(top_scores)
        return RetrievalResult(
            jnp.where(hit, top_slots, -1),
            jnp.where(hit, top_scores, 0.0),
            jnp.where(hit[..., None], top_feats, 0.0))

    fn = jax.shard_map(
        local_retrieve, mesh=mesh,
        in_specs=(P(axis), P()),
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
