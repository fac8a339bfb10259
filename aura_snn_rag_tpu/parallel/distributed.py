"""Multi-host / multi-process launcher seam (SURVEY §2.8 launcher row).

The reference is strictly single-process (SURVEY §0: no torch.distributed
anywhere); for TPU pods the equivalent capability is
`jax.distributed.initialize` + a mesh spanning all processes + Orbax
multi-process checkpointing (which activates automatically once the
distributed runtime is initialized). Elasticity follows the reference's
philosophy: checkpoint-based resumption, no live elastic scaling.

Entry points:
- `initialize()` — idempotent process-group init from explicit args or
  standard env vars (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID,
  or the TPU auto-detection built into JAX when args are omitted).
- `global_mesh(n_model)` — a ('data','model') mesh over ALL processes'
  devices (jax.devices() is global after initialize()).
- `local_batch_slice(global_batch)` — the per-process batch range, for
  per-host data loading.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> bool:
    """Initialize the JAX distributed runtime (idempotent).

    Returns True if a multi-process group was set up, False for the
    single-process no-op path. Arguments fall back to env vars
    (AURA_COORDINATOR / AURA_NUM_PROCESSES / AURA_PROCESS_ID), then to
    JAX's own auto-detection (TPU pod metadata) when all are absent.
    """
    global _initialized
    if _initialized:
        return is_multiprocess()

    coordinator_address = (coordinator_address
                           or os.environ.get("AURA_COORDINATOR"))
    if num_processes is None and "AURA_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["AURA_NUM_PROCESSES"])
    if process_id is None and "AURA_PROCESS_ID" in os.environ:
        process_id = int(os.environ["AURA_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # single-process: nothing to do (jax.distributed.initialize with no
        # args is only valid on real multi-host TPU pods)
        _initialized = True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True
    return is_multiprocess()


def global_mesh(n_model: int = 1,
                axis_names: Tuple[str, str] = ("data", "model")) -> Mesh:
    """('data','model') mesh over every device in the (multi-process) job.

    The 'model' axis is laid out within a process (ICI-adjacent devices)
    and 'data' spans processes (DCN) — TP collectives stay on ICI, only
    gradient psum crosses hosts, the standard pod recipe.
    """
    devices = jax.devices()
    n = len(devices)
    assert n % n_model == 0, f"{n} devices not divisible by model={n_model}"
    # sort by (process_index, id) so the model axis groups intra-process
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(arr, axis_names)


def multislice_mesh(n_slices: int, n_model: int = 1,
                    axis_names: Tuple[str, str, str] = ("replica", "data",
                                                        "model"),
                    devices=None) -> Mesh:
    """('replica','data','model') mesh for multi-slice (DCN×ICI) jobs.

    'replica' spans slices — collectives over it ride DCN; 'data'/'model'
    stay within a slice (ICI). On real multi-slice TPU the grouping uses
    each device's slice_index; elsewhere (CPU tests, single slice) devices
    are grouped by (process_index, id) so the axis layout is still
    DCN-outermost. Designed for: gradient psum over ('replica','data'),
    TP over 'model', and the hierarchical sharded memory bank over
    ('replica','data') (memory.sharded).
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    assert n % (n_slices * n_model) == 0, (
        f"{n} devices not divisible by {n_slices} slices x model={n_model}")
    if all(getattr(d, "slice_index", None) is not None for d in devices):
        devices = sorted(devices, key=lambda d: (d.slice_index,
                                                 d.process_index, d.id))
    else:
        devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devices).reshape(
        n_slices, n // (n_slices * n_model), n_model)
    return Mesh(arr, axis_names)


def local_batch_slice(global_batch: int) -> slice:
    """Each process loads its own slice of the global batch."""
    pc, pi = jax.process_count(), jax.process_index()
    assert global_batch % pc == 0, (
        f"global batch {global_batch} not divisible by {pc} processes")
    per = global_batch // pc
    return slice(pi * per, (pi + 1) * per)


def make_global_array(local_batch: np.ndarray, mesh: Mesh,
                      axis: str = "data"):
    """Assemble a globally-sharded array from per-process local batches
    (the multi-host equivalent of device_put'ing a full batch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis))
    global_shape = (local_batch.shape[0] * jax.process_count(),
                    *local_batch.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, local_batch, global_shape)
