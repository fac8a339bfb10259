"""Persistent XLA compilation cache setup (imported by the package root).

Compile times dominate iteration on both CPU and TPU; a shared on-disk cache
makes every process after the first start warm.
"""

import os

import jax

_CACHE_DIR = os.environ.get(
    "AURA_JAX_CACHE_DIR", os.path.expanduser("~/.cache/aura_jax_cache"))

try:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass
