"""Profiling hooks: jax.profiler integration + named-scope annotations.

The reference has no profiler integration (SURVEY §5.1 — BrainStats is its
only telemetry); on TPU the native story is `jax.profiler` traces viewable
in TensorBoard/Perfetto plus `TraceAnnotation` scopes on the hot paths.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/aura_trace",
          create_perfetto_link: bool = False) -> Iterator[str]:
    """Capture a device trace for the enclosed block.

        with trace("/tmp/aura_trace"):
            trainer.train_step(ids, ids)

    NOTE: device trace capture requires a local backend; on tunneled
    backends (axon remote TPU) it can stall — prefer `annotate` +
    `StepTimer` there.
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named scope that shows up in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Host-side step timing with tunnel-safe fencing.

    `block_until_ready` does not synchronize on tunneled backends; fence
    with a host transfer of a small output instead.
    """

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, fence_output=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if fence_output is not None:
            import numpy as np
            leaf = jax.tree.leaves(fence_output)
            if leaf:
                np.asarray(jax.tree.leaves(fence_output)[0]).ravel()[:1]
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> dict:
        if not self.times:
            return {"n": 0}
        import numpy as np
        arr = np.asarray(self.times)
        return {"n": len(arr), "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p95_ms": float(np.percentile(arr, 95) * 1e3)}
