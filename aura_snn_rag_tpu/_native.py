"""Loader for the native host-side library (ctypes ABI, no pybind11).

One shared object (native/libaura_native.so) holds every native kernel
(hash embedder, spill rerank, ...). Built on demand from all .cpp sources
and rebuilt when any source is newer than the artifact, so adding a kernel
never strands callers on a stale .so missing its symbol.
"""

from __future__ import annotations

import ctypes
import glob
import os
from typing import Optional

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libaura_native.so")

_lib = None
_loaded = False


def load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None on failure."""
    global _lib, _loaded
    if _loaded:
        return _lib
    _loaded = True
    sources = sorted(glob.glob(os.path.join(_NATIVE_DIR, "*.cpp")))
    if not sources:
        return None
    stale = (not os.path.exists(_SO_PATH)
             or any(os.path.getmtime(s) > os.path.getmtime(_SO_PATH)
                    for s in sources))
    if stale:
        import subprocess
        try:
            # portable baseline ISA (no -march=native): the built .so may
            # travel with the checkout; an AVX-512 artifact would SIGILL
            # on older hosts. These kernels are memory/hash-bound, not
            # SIMD-bound, so the cost is negligible.
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH]
                + sources,
                check=True, capture_output=True, timeout=180)
        except Exception:
            if not os.path.exists(_SO_PATH):
                return None
    try:
        _lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        _lib = None
    return _lib
