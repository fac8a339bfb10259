"""Pre-compile the hot entry points into the persistent compile cache.

Mitigation for cold-compile fragility (round-1 weak #5): on tunneled/AOT
backends a cold compile of the 1M-row index rebuild takes minutes; this
tool warms the cache for the shapes production uses so a cache wipe (or a
fresh host) pays the cost once, offline, instead of on the serving path.

    python tools/warm_cache.py [--n 1000000] [--d 768] [--batches 1,8,32,128]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--probe", type=int, default=64)
    ap.add_argument("--batches", default="1,8,32,128")
    ap.add_argument("--coarse", default="bf16",
                    help="comma list of flat-scan coarse dtypes to warm "
                         "(bf16,int8)")
    ap.add_argument("--kernels", default="v3",
                    help="comma list of IVF kernel generations to warm "
                         "(v2,v3,v3r)")
    ap.add_argument("--flat-strategies", default="blockmax",
                    help="comma list of flat-scan strategies to warm "
                         "(blockmax,scan)")
    ap.add_argument("--flat-tiles", default="0",
                    help="comma list of blockmax tile_m values to warm "
                         "(0 = config default)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from aura_snn_rag_tpu.config import MemoryConfig
    from aura_snn_rag_tpu.memory import (
        init_memory_state, rebuild_centroids, retrieve, retrieve_flat)
    from aura_snn_rag_tpu.memory.engine import bulk_load, write_memories

    rng = np.random.RandomState(0)
    feats = rng.randn(args.n, args.d).astype(np.float32)

    for coarse in args.coarse.split(","):
        coarse = {"bf16": "bf16", "int8": "int8"}[coarse.strip()]
        cfg = MemoryConfig(max_memories=args.n, feature_dim=args.d,
                           k_centroids=args.k, probe_centroids=args.probe,
                           bucket_overprovision=2.0, rebuild_lloyd_iters=2,
                           overflow_buckets=64, coarse_dtype=coarse,
                           n_place_cells=16, n_grid_cells=8, n_time_cells=4)

        t0 = time.time()
        state = init_memory_state(cfg)
        state = bulk_load(cfg, state, jnp.asarray(feats),
                          jnp.zeros((args.n, 2), np.float32))
        state = rebuild_centroids(cfg, state, jax.random.PRNGKey(0))
        np.asarray(state.centroid_counts)
        print(f"[{coarse}] rebuild warmed in {time.time()-t0:.1f}s",
              flush=True)

        state = write_memories(cfg, state,
                               jnp.asarray(feats[:8]), jnp.zeros((8, 2)))
        np.asarray(state.count)
        print(f"[{coarse}] write warmed", flush=True)

        import dataclasses
        for B in [int(b) for b in args.batches.split(",")]:
            q = jnp.asarray(feats[:B])
            for kver in args.kernels.split(","):
                cfg_k = dataclasses.replace(cfg, ivf_kernel=kver.strip())
                t0 = time.time()
                res = retrieve(cfg_k, state, q, None, 10)
                np.asarray(res.indices)
                print(f"[{coarse}] ivf-{kver} B={B} warmed in "
                      f"{time.time()-t0:.1f}s", flush=True)
            for strat in args.flat_strategies.split(","):
                for tile in [int(t) for t in args.flat_tiles.split(",")]:
                    kw = {"flat_strategy": strat.strip()}
                    if tile:
                        kw["flat_tile_m"] = tile
                    cfg_f = dataclasses.replace(cfg, **kw)
                    t0 = time.time()
                    res = retrieve_flat(cfg_f, state, q, None, 10)
                    np.asarray(res.indices)
                    print(f"[{coarse}] flat/{strat} tile={tile or 'dflt'} "
                          f"B={B} warmed in {time.time()-t0:.1f}s",
                          flush=True)
    print("cache warm", flush=True)


if __name__ == "__main__":
    main()
