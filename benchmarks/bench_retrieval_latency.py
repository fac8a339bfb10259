"""Small-batch retrieval latency: IVF vs flat scan at B=1/8/32 (TPU).

VERDICT r1 weak #4: the Pallas IVF kernel loses to the flat bf16 scan at
B=128 (where one full-bank pass amortizes over the batch), but its claimed
winning regime — low-latency small batches, where the flat scan's full
HBM read (~1.5 GB bf16 at 1M×768) is pure waste — was never measured.
This bench measures exactly that, plus recall@10 of each path.

    python benchmarks/bench_retrieval_latency.py [--small]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batches", default="1,8,32,128")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--kernel", default="",
                    help="override MemoryConfig.ivf_kernel (v2|v3|v3r)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from aura_snn_rag_tpu.config import MemoryConfig
    from aura_snn_rag_tpu.memory import (
        init_memory_state, rebuild_centroids, retrieve, retrieve_flat)
    from aura_snn_rag_tpu.memory.engine import bulk_load

    N = 100_000 if args.small else 1_000_000
    D = 768
    K = 1024 if args.small else 4096
    PROBE = 32 if args.small else 64
    TOPK = 10

    rng = np.random.RandomState(0)
    centers = rng.randn(1024, D).astype(np.float32) * 2.0
    assign = rng.randint(0, 1024, N)
    feats = centers[assign] + rng.randn(N, D).astype(np.float32)
    queries = feats[rng.randint(0, N, 128)] + \
        0.1 * rng.randn(128, D).astype(np.float32)

    kernel_kw = {"ivf_kernel": args.kernel} if args.kernel else {}
    cfg = MemoryConfig(max_memories=N, feature_dim=D, k_centroids=K,
                       probe_centroids=PROBE, retrieve_k=TOPK,
                       bucket_overprovision=2.0, rebuild_lloyd_iters=2,
                       overflow_buckets=8 if args.small else 64,
                       n_place_cells=16, n_grid_cells=8, n_time_cells=4,
                       **kernel_kw)
    state = init_memory_state(cfg)
    state = bulk_load(cfg, state, jnp.asarray(feats),
                      jnp.zeros((N, 2), np.float32))
    state = rebuild_centroids(cfg, state, jax.random.PRNGKey(0))
    np.asarray(state.centroid_counts)                     # fence
    print("index built", flush=True)

    # exact reference ranking for recall
    fn_ = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
    qn = queries / (np.linalg.norm(queries, axis=1, keepdims=True) + 1e-12)
    exact = np.zeros((len(queries), TOPK), np.int64)
    for i in range(0, len(queries), 8):
        cos = qn[i:i + 8] @ fn_.T
        part = np.argpartition(-cos, TOPK, axis=1)[:, :TOPK]
        row = cos[np.arange(len(part))[:, None], part]
        exact[i:i + 8] = part[np.arange(len(part))[:, None],
                              np.argsort(-row, axis=1)]

    def recall(idx):
        hits = 0
        for i in range(len(idx)):
            hits += len(set(int(x) for x in idx[i]) &
                        set(int(x) for x in exact[i]))
        return hits / (len(idx) * TOPK)

    # the metadata sidecar is a pure function of bank state — serving
    # builds it once per mutation (HippocampalFormation.retrieve_batch
    # caches it), so queries are benched with it precomputed
    from aura_snn_rag_tpu.memory.engine import build_ivf_aux
    aux = build_ivf_aux(cfg, state)
    np.asarray(aux[0, 0, :1])                             # fence

    def ivf(c, s, q, loc, kk):
        return retrieve(c, s, q, loc, kk, aux=aux)

    out = {"metric": "retrieval latency IVF vs flat", "n_vectors": N}
    for B in [int(b) for b in args.batches.split(",")]:
        qb = jnp.asarray(queries[:B])
        for name, fn in (("ivf", ivf), ("flat", retrieve_flat)):
            res = fn(cfg, state, qb, None, TOPK)          # compile+warm
            np.asarray(res.indices)
            # single-dispatch wall latency (includes the tunnel roundtrip
            # on axon, ~30 ms — the production on-host number is the
            # pipelined device time below)
            t0 = time.perf_counter()
            res = fn(cfg, state, qb, None, TOPK)
            np.asarray(res.indices)                       # fence
            wall_ms = (time.perf_counter() - t0) * 1e3
            # pipelined device time: queue R dispatches, fence once —
            # amortizes the roundtrip out of the measurement
            R = max(args.reps, 10)
            t0 = time.perf_counter()
            for _ in range(R):
                res = fn(cfg, state, qb, None, TOPK)
            np.asarray(res.indices)
            dev_ms = (time.perf_counter() - t0) * 1e3 / R
            r = recall(np.asarray(res.indices))
            out[f"{name}_B{B}"] = {
                "wall_latency_ms": round(wall_ms, 3),
                "device_ms": round(dev_ms, 3),
                "device_qps": round(B / (dev_ms / 1e3), 1),
                "recall_at_10": round(r, 4)}
            print(f"{name} B={B}: wall {wall_ms:.2f} ms  device "
                  f"{dev_ms:.2f} ms  {B/(dev_ms/1e3):,.0f} QPS "
                  f"recall={r:.3f}", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
