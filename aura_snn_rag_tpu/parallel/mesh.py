"""Mesh construction and parameter sharding rules.

Tensor-parallel layout (scaling-book style): shard the contracting/output
feature dims of the big matmuls over the 'model' axis so the per-layer
pattern is column-parallel (QKV, FFN-up) → row-parallel (O, FFN-down) with a
single psum per block, all inserted by GSPMD. Batch (and the episodic bank's
row dimension) shard over 'data'.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_model: int = 1, devices=None,
              axis_names=("data", "model")) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % n_model == 0, f"{n} devices not divisible by model={n_model}"
    arr = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(arr, axis_names)


# path-regex → PartitionSpec for the transformer parameter tree.
# kernels are [in, out]; 'model' goes on the dimension that splits
# heads / FFN hidden (column-parallel) or contracts them (row-parallel).
_RULES = [
    (r"token_embedding/embedding", P(None, "model")),      # [V, D/model]
    (r"(q_proj|k_proj|v_proj)/kernel", P(None, "model")),  # column parallel
    (r"o_proj/kernel", P("model", None)),                  # row parallel
    (r"ffn/(up|mlp/up)/kernel", P(None, "model")),
    (r"ffn/(down|mlp/down)/kernel", P("model", None)),
    (r"ffn/snn/syn1/kernel", P(None, "model")),
    (r"ffn/snn/gif1_in/kernel", P("model", None)),
    (r"ffn/snn/syn2/kernel", P("model", None)),
    (r"memory_attention/(query|key|value)/kernel", P(None, None, "model")),
    (r"memory_attention/out/kernel", P("model", None, None)),
]


def param_sharding_rules(path: str, ndim: Optional[int] = None) -> P:
    # Expert parallelism (SURVEY §2.8 EP row): stacked [E, ...] expert
    # params shard over 'model' on the leading expert axis; GSPMD then
    # turns the dispatch/combine einsums into all_to_all over ICI.
    if "experts/" in path and ndim is not None and ndim >= 1:
        return P(*(("model",) + (None,) * (ndim - 1)))
    for pattern, spec in _RULES:
        if re.search(pattern, path):
            return spec
    return P()  # replicate everything else (norms, gates, biases, offsets)


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_specs(params, mesh: Optional[Mesh] = None):
    """PartitionSpec pytree matching `params`.

    With `mesh` given, axes the mesh doesn't have are dropped (replicated) —
    e.g. the TP 'model' rules on a pure DP/SP ('data','seq') mesh."""
    specs = jax.tree_util.tree_map_with_path(
        lambda kp, x: param_sharding_rules(_path_str(kp), jnp.ndim(x)),
        params)
    if mesh is None:
        return specs

    def prune(spec):
        def keep(e):
            if e is None:
                return None
            if isinstance(e, tuple):
                kept = tuple(a for a in e if a in mesh.axis_names)
                return kept if kept else None
            return e if e in mesh.axis_names else None
        return P(*(keep(e) for e in spec))
    return jax.tree.map(prune, specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree onto the mesh per the TP rules."""
    specs = param_specs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def shard_batch(batch, mesh: Mesh):
    """Shard leading (batch) dim of every array over 'data'."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch)


def memory_state_specs(state):
    """Shard the episodic bank's row dimension over 'data'.

    The bank rows, cluster buckets, and centroids are partitioned so each
    data-parallel group holds a shard; retrieval merges shards via the
    engine's sharded path (memory/sharded.py). Scalars replicate.
    """
    def spec(x):
        if x.ndim == 0:
            return P()
        return P("data")
    return jax.tree.map(spec, state)
