"""Pipeline parallelism: GPipe-style microbatch pipeline over a mesh axis.

The reference has no distributed training of any kind (SURVEY §2.8); the
survey's plan excludes PP at the 271M flagship scale but asks for a design
seam "compatible with pipelining if scaled". This is that seam, made real:
a `shard_map` ring pipeline where

- the layer stack is split into S contiguous stages; per-stage params are
  stacked on a leading [S, ...] axis and sharded over the `stage` mesh axis
  (one stage per device group),
- a batch is split into M microbatches; each scan step every stage runs its
  block on its current microbatch and hands the activation to the next
  stage with a single `ppermute` hop (ICI-neighbor traffic only),
- the classic GPipe schedule: M + S - 1 steps, bubble fraction
  (S-1)/(M+S-1); gradients flow through `scan` + `ppermute`, so
  `jax.grad` over the stacked stage params yields per-stage grads already
  sharded where their stage lives.

Composes with the rest of the mesh: 'stage' can be any axis of a larger
('stage','data','model') mesh — the block_fn's internals may themselves be
tensor-parallel over 'model'.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(per_stage_params, mesh: Mesh, axis: str = "stage"):
    """Stack a list of S per-stage param pytrees on a leading axis and
    shard it over `axis` (stage s's params live on stage s's devices)."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)


def pipeline_apply(block_fn: Callable[..., Any],
                   stage_params, microbatches, mesh: Mesh,
                   axis: str = "stage", consts: Any = None):
    """Run `microbatches` (array or pytree, leaves [M, mb, ...]) through S
    pipelined stages.

    block_fn(params_for_one_stage, x[, consts]) -> y must be
    shape-preserving between stages (the usual transformer-layer contract);
    x/y may be pytrees (e.g. (hidden, prosody) with prosody passed through
    unchanged).

    consts: optional pytree of NON-microbatched operands replicated to
    every stage (e.g. the episodic `MemoryState` for RAG stages — each
    stage's per-layer retrieval reads the same replicated bank locally,
    no cross-stage collectives). Passed as block_fn's third argument.

    Returns the last stage's outputs (leaves [M, mb, ...]), replicated over
    `axis`. Differentiable: take `jax.grad` through this of a loss on the
    output; grads of `stage_params` come back sharded over `axis`.
    """
    S = mesh.shape[axis]
    M = jax.tree.leaves(microbatches)[0].shape[0]
    T = M + S - 1
    perm = [(i, (i + 1) % S) for i in range(S)]

    def local(params, xs, cs):
        params = jax.tree.map(lambda p: p[0], params)    # [1,...] -> [...]
        sid = jax.lax.axis_index(axis)
        zero = jax.tree.map(
            lambda x: jnp.zeros(x.shape[1:], x.dtype), xs)

        def step(inflow, t):
            idx = jnp.clip(t, 0, M - 1)
            x_first = jax.tree.map(lambda x: x[idx], xs)
            x = jax.tree.map(
                lambda a, b: jnp.where(sid == 0, a, b), x_first, inflow)
            y = block_fn(params, x) if cs is None else block_fn(params, x, cs)
            # ring hop to the next stage; during fill/drain the payload is
            # a don't-care (never read by the output collection below)
            hop = jax.tree.map(
                lambda v: jax.lax.ppermute(v, axis, perm), y)
            return hop, y

        _, ys = jax.lax.scan(step, zero, jnp.arange(T))
        # last stage's outputs at steps S-1..T-1 are microbatches 0..M-1
        valid = jax.tree.map(lambda v: v[S - 1:], ys)    # [M, mb, ...]
        gathered = jax.tree.map(
            lambda v: jax.lax.all_gather(v, axis), valid)
        return jax.tree.map(lambda v: v[S - 1], gathered)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(axis), P(), P()), out_specs=P(),
                       check_vma=False)
    return fn(stage_params, microbatches, consts)


def split_microbatches(batch: jax.Array, num_microbatches: int) -> jax.Array:
    """[B, ...] -> [M, B/M, ...]."""
    B = batch.shape[0]
    assert B % num_microbatches == 0, (B, num_microbatches)
    return batch.reshape((num_microbatches, B // num_microbatches)
                         + batch.shape[1:])
