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


def pipeline_apply(block_fn: Callable[[Any, jax.Array], jax.Array],
                   stage_params, microbatches: jax.Array, mesh: Mesh,
                   axis: str = "stage") -> jax.Array:
    """Run `microbatches` [M, mb, ...] through S pipelined stages.

    block_fn(params_for_one_stage, x[mb, ...]) -> y[mb, ...] must be
    shape-preserving between stages (the usual transformer-layer contract).
    Returns the last stage's outputs [M, mb, ...], replicated over `axis`.
    Differentiable: take `jax.grad` through this of a loss on the output;
    grads of `stage_params` come back sharded over `axis`.
    """
    S = mesh.shape[axis]
    M = microbatches.shape[0]
    T = M + S - 1
    perm = [(i, (i + 1) % S) for i in range(S)]

    def local(params, xs):
        params = jax.tree.map(lambda p: p[0], params)    # [1,...] -> [...]
        xs = xs                                          # replicated [M,...]
        sid = jax.lax.axis_index(axis)
        zero = jnp.zeros(xs.shape[1:], xs.dtype)

        def step(inflow, t):
            x_first = xs[jnp.clip(t, 0, M - 1)]
            x = jnp.where(sid == 0, x_first, inflow)
            y = block_fn(params, x)
            # ring hop to the next stage; during fill/drain the payload is
            # a don't-care (never read by the output collection below)
            return jax.lax.ppermute(y, axis, perm), y

        _, ys = jax.lax.scan(step, zero, jnp.arange(T))
        # last stage's outputs at steps S-1..T-1 are microbatches 0..M-1
        valid = ys[S - 1:]                               # [M, mb, ...]
        gathered = jax.lax.all_gather(valid, axis)       # [S, M, mb, ...]
        return gathered[S - 1]

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(axis), P()), out_specs=P(),
                       check_vma=False)
    return fn(stage_params, microbatches)


def split_microbatches(batch: jax.Array, num_microbatches: int) -> jax.Array:
    """[B, ...] -> [M, B/M, ...]."""
    B = batch.shape[0]
    assert B % num_microbatches == 0, (B, num_microbatches)
    return batch.reshape((num_microbatches, B // num_microbatches)
                         + batch.shape[1:])
