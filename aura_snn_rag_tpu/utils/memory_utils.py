"""Host/device memory management utilities.

Parity with the reference's memory utilities (SURVEY §2.6):
- `ArrayPool` ↔ `training/memory_pool.py` (:82): thread-safe reuse pool for
  host staging arrays (avoids realloc churn in the ingestion pipeline);
- `get_memory_stats` / `maybe_defragment` ↔ `training/memory_manager.py`
  (:7-58): the reference's "smart `torch.cuda.empty_cache` when free ratio
  < 0.12"; the JAX analogue reads device memory stats and can trigger a
  defragmenting sync (XLA manages HBM itself — this surfaces telemetry and
  a best-effort `jax.clear_caches` pressure valve).
"""

from __future__ import annotations

import threading
from typing import Dict, Optional, Tuple

import jax
import numpy as np


class ArrayPool:
    """Thread-safe pool of reusable numpy arrays keyed by (shape, dtype)."""

    def __init__(self, max_per_key: int = 8):
        self._pool: Dict[Tuple, list] = {}
        self._lock = threading.Lock()
        self.max_per_key = max_per_key
        self.hits = 0
        self.misses = 0

    def get(self, shape, dtype=np.float32) -> np.ndarray:
        key = (tuple(shape), np.dtype(dtype).str)
        with self._lock:
            bucket = self._pool.get(key)
            if bucket:
                self.hits += 1
                return bucket.pop()
        self.misses += 1
        return np.zeros(shape, dtype)

    def put(self, arr: np.ndarray) -> None:
        key = (arr.shape, arr.dtype.str)
        with self._lock:
            bucket = self._pool.setdefault(key, [])
            if len(bucket) < self.max_per_key:
                bucket.append(arr)

    def stats(self) -> Dict[str, int]:
        with self._lock:
            pooled = sum(len(v) for v in self._pool.values())
        return {"hits": self.hits, "misses": self.misses, "pooled": pooled}


def get_memory_stats(device=None) -> Dict[str, float]:
    """Device memory telemetry (bytes). Zeroes when the backend lacks it."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except (RuntimeError, AttributeError):
        stats = {}
    in_use = float(stats.get("bytes_in_use", 0))
    limit = float(stats.get("bytes_limit", 0))
    return {
        "bytes_in_use": in_use,
        "bytes_limit": limit,
        "peak_bytes_in_use": float(stats.get("peak_bytes_in_use", 0)),
        "free_ratio": (limit - in_use) / limit if limit else 1.0,
    }


def maybe_defragment(threshold: float = 0.12, device=None) -> bool:
    """If free HBM ratio < threshold, drop jit caches (pressure valve).
    Mirrors memory_manager.py's free-ratio-gated cache purge."""
    stats = get_memory_stats(device)
    if stats["free_ratio"] < threshold:
        jax.clear_caches()
        return True
    return False
