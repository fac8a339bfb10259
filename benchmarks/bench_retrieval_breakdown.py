"""Per-stage latency breakdown of the IVF retrieval dispatch (TPU).

The full IVF query at B=1 measures ~3.4 ms on v5e while its HBM traffic
model says ~0.25 ms — overhead-bound, but WHERE? This bench times each
stage as its own pipelined dispatch:

  1. aux_build       — [K, 8, C] metadata sidecar (now cached per state)
  2. centroid_topP   — centroid matvec + lax.top_k(P)
  3. kernel_v2       — fused gather+score+per-probe-top-k Pallas kernel
  4. kernel_v1       — gather+dot kernel (no in-kernel top-k), isolates
                       the iterative in-kernel top-k extraction cost
  5. funnel_rerank   — narrow exact top-k + f32 rerank + final top-k
  6. full            — retrieve() with precomputed aux
  7. full_noaux      — retrieve() rebuilding aux per query (old behavior)

    python benchmarks/bench_retrieval_breakdown.py [--small] [--batches 1,8]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from aura_snn_rag_tpu.config import MemoryConfig
    from aura_snn_rag_tpu.memory import (
        init_memory_state, rebuild_centroids, retrieve)
    from aura_snn_rag_tpu.memory.engine import (
        NEG_INF, _combined_score, _l2norm, build_ivf_aux, bulk_load)
    from aura_snn_rag_tpu.ops.pallas.ivf_scan import (
        default_interpret, ivf_candidates, ivf_scan_scores, ivf_topk_scores)

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

    import dataclasses
    cfg = MemoryConfig(max_memories=N, feature_dim=D, k_centroids=K,
                       probe_centroids=PROBE, retrieve_k=TOPK,
                       bucket_overprovision=2.0, rebuild_lloyd_iters=2,
                       overflow_buckets=8 if args.small else 64,
                       n_place_cells=16, n_grid_cells=8, n_time_cells=4)
    cfg_v2 = dataclasses.replace(cfg, ivf_kernel="v2")
    cfg_v3r = dataclasses.replace(cfg, ivf_kernel="v3r")
    state = init_memory_state(cfg)
    state = bulk_load(cfg, state, jnp.asarray(feats),
                      jnp.zeros((N, 2), np.float32))
    state = rebuild_centroids(cfg, state, jax.random.PRNGKey(0))
    np.asarray(state.centroid_counts)
    print("index built", flush=True)

    C = state.bucket_capacity
    kk = min(max(cfg.rerank_candidates, 4 * TOPK), PROBE * C)
    per_k = min(max(TOPK, -(-kk // PROBE)), C)
    interp = default_interpret()

    @jax.jit
    def stage_aux(state):
        return build_ivf_aux(cfg, state)

    @jax.jit
    def stage_centroid(state, q):
        qn = _l2norm(q)
        c2 = jnp.sum(state.centroids ** 2, axis=-1)
        qc = q @ state.centroids.T
        cdist = c2[None, :] - 2.0 * qc
        _, top_c = jax.lax.top_k(-cdist, PROBE)
        return qn, top_c

    @jax.jit
    def stage_kernel_v2(state, aux, qn, top_c):
        return ivf_topk_scores(state.clustered, aux, qn, top_c, per_k,
                               interpret=interp)

    @jax.jit
    def stage_kernel_v1(state, qn, top_c):
        return ivf_scan_scores(state.clustered, qn, top_c,
                               interpret=interp)

    KK = -(-kk // 128) * 128

    @jax.jit
    def stage_kernel_v3(state, aux, qn, top_c):
        return ivf_candidates(state.clustered, aux, qn, top_c, KK,
                              interpret=interp)

    @functools.partial(jax.jit, static_argnums=())
    def stage_funnel(state, qn, sc, sl):
        B = qn.shape[0]
        combined = sc[:, :, :per_k].reshape(B, -1)
        slots = jnp.maximum(sl[:, :, :per_k], 0).reshape(B, -1)
        valid = combined > NEG_INF / 2
        if combined.shape[-1] > kk:
            _, pick = jax.lax.top_k(combined, kk)
            slots = jnp.take_along_axis(slots, pick, axis=1)
            valid = jnp.take_along_axis(valid, pick, axis=1)
        cand_feats = state.features[slots]
        exact_cos = jnp.einsum(
            "bkd,bd->bk", _l2norm(cand_feats.astype(jnp.float32)), qn,
            precision=jax.lax.Precision.HIGHEST)
        exact = _combined_score(cfg, state, exact_cos, slots, None)
        exact = jnp.where(valid, exact, NEG_INF)
        scores, pick2 = jax.lax.top_k(exact, TOPK)
        return jnp.take_along_axis(slots, pick2, axis=1), scores

    aux = stage_aux(state)
    np.asarray(aux[0, 0, :1])

    out = {"metric": "ivf retrieval stage breakdown", "n_vectors": N,
           "probe": PROBE, "bucket_capacity": C, "per_k": per_k}

    def timed(label, fn, fence):
        r = fn()                                        # compile + warm
        np.asarray(fence(r))
        R = args.reps
        t0 = time.perf_counter()
        for _ in range(R):
            r = fn()
        np.asarray(fence(r))
        ms = (time.perf_counter() - t0) * 1e3 / R
        print(f"  {label:16s} {ms:8.3f} ms", flush=True)
        return round(ms, 3)

    for B in [int(b) for b in args.batches.split(",")]:
        qb = jnp.asarray(queries[:B])
        print(f"B={B}:", flush=True)
        res = {}
        res["aux_build_ms"] = timed(
            "aux_build", lambda: stage_aux(state), lambda r: r[0, 0, :1])
        qn, top_c = stage_centroid(state, qb)
        res["centroid_topP_ms"] = timed(
            "centroid_topP", lambda: stage_centroid(state, qb),
            lambda r: r[1][0, :1])
        sc, sl = stage_kernel_v2(state, aux, qn, top_c)
        res["kernel_v2_ms"] = timed(
            "kernel_v2", lambda: stage_kernel_v2(state, aux, qn, top_c),
            lambda r: r[0][0, 0, :1])
        res["kernel_v1_ms"] = timed(
            "kernel_v1", lambda: stage_kernel_v1(state, qn, top_c),
            lambda r: r[0, 0, :1])
        res["kernel_v3_ms"] = timed(
            "kernel_v3", lambda: stage_kernel_v3(state, aux, qn, top_c),
            lambda r: r[0][0, :1])
        res["funnel_rerank_ms"] = timed(
            "funnel_rerank", lambda: stage_funnel(state, qn, sc, sl),
            lambda r: r[0][0, :1])
        res["full_v3_ms"] = timed(
            "full_v3", lambda: retrieve(cfg, state, qb, None, TOPK, aux=aux),
            lambda r: r.indices[0, :1])
        res["full_v3r_ms"] = timed(
            "full_v3r",
            lambda: retrieve(cfg_v3r, state, qb, None, TOPK, aux=aux),
            lambda r: r.indices[0, :1])
        res["full_v2_ms"] = timed(
            "full_v2",
            lambda: retrieve(cfg_v2, state, qb, None, TOPK, aux=aux),
            lambda r: r.indices[0, :1])
        res["full_noaux_ms"] = timed(
            "full_noaux", lambda: retrieve(cfg, state, qb, None, TOPK),
            lambda r: r.indices[0, :1])
        out[f"B{B}"] = res

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
