"""Prosody attention benchmark: throughput + cache speedup.

Parity with `/root/reference/scripts/benchmark_prosody.py` (377 LoC): runs
the prosody-salience chain over batches of token sequences, measures
throughput, and the LRU-cache speedup on repeated content (the reference
claims 50-80%, optimized_prosody_attention.py:6).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from aura_snn_rag_tpu.models.prosody import (
        ANALYTICAL_BALANCED, CachedProsodyBridge)

    bridge = CachedProsodyBridge(ANALYTICAL_BALANCED)
    rng = np.random.RandomState(0)
    batches = [rng.randint(0, 32000, (8, 256)) for _ in range(16)]

    # warmup/compile
    bridge(batches[0])
    jax.block_until_ready(bridge(batches[1]))

    t0 = time.perf_counter()
    for b in batches:
        np.asarray(bridge(b))
    cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    for b in batches:                   # all cached now
        np.asarray(bridge(b))
    warm = time.perf_counter() - t0

    tokens = sum(b.size for b in batches)
    print(json.dumps({
        "tokens_per_s_uncached": round(tokens / cold, 1),
        "cache_speedup_pct": round(100 * (1 - warm / cold), 1),
        "hit_rate": round(bridge.stats["hit_rate"], 3),
    }))


if __name__ == "__main__":
    main()
