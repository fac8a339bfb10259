"""Persistent XLA compilation cache setup (imported by the package root).

Compile times dominate iteration on both CPU and TPU; a shared on-disk cache
makes every process after the first start warm.

The cache directory is keyed by (platform, host-CPU fingerprint, jax version):
CPU AOT entries embed the compiling host's CPU features and fail to load on a
machine with different features (cpu_aot_loader machine-feature mismatch), and
entries from different backends sharing one directory trigger the same noisy
reload-then-recompile path. One subdirectory per (platform, host) keeps every
entry loadable where it sits.
"""

import hashlib
import os
import platform as _platform

import jax


def _host_fingerprint() -> str:
    parts = [_platform.machine(), jax.__version__]
    # the platform the process will use: an explicit jax_platforms config
    # (set by callers before importing this package) wins, then the env var,
    # else whatever auto-selection picks (distinct dir from forced modes)
    platforms = None
    try:
        platforms = jax.config.jax_platforms
    except AttributeError:
        pass
    platforms = platforms or os.environ.get("JAX_PLATFORMS") or "auto"
    parts.append(platforms)
    # Only CPU AOT entries embed the compiling host's CPU features (and
    # fail to load elsewhere) — accelerator binaries are host-agnostic, so
    # fingerprinting the host CPU for them would strand the cache on every
    # new VM (each TPU compile here is a ~20-40 s remote-service round
    # trip). "auto" on this fleet resolves to the TPU tunnel; forced-cpu
    # callers (tests, the multichip dryrun) say "cpu" explicitly.
    if platforms.startswith("cpu"):
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "Features")):
                        parts.append(line.strip())
                        break
        except OSError:
            parts.append(_platform.processor() or "unknown-cpu")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


_CACHE_DIR = os.environ.get("AURA_JAX_CACHE_DIR")
if _CACHE_DIR is None:
    _CACHE_DIR = os.path.join(
        os.path.expanduser("~/.cache/aura_jax_cache"), _host_fingerprint())

try:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass
