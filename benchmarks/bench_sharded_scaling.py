"""Multi-chip scaling evidence without multi-chip hardware (VERDICT r3 #7).

Runs the SHARDED retrieval path on an n-device virtual CPU mesh and
produces the two things a scaling claim needs:

1. **Per-shard work equivalence**: the sharded top-k over n shards of
   M/n rows each returns the same results as one flat bank of M rows
   (correctness of the per-shard-top-k + all_gather merge), and each
   shard provably scans only its slice (the per-shard bank arrays are
   [M/n, D]).
2. **Measured collective bytes**: the compiled HLO of the sharded
   retrieval is parsed for all-gather / all-reduce / collective-permute
   ops and their byte sizes — the ICI/DCN traffic term of the QPS model
   published in docs/SCALING.md, validated against the analytic
   k·(D+2)·S prediction.

    python benchmarks/bench_sharded_scaling.py [--n=8] [--per-shard=16384]

Invoked by `python bench.py --sharded=N` (forces the virtual CPU mesh;
the headline single-chip QPS stays the real-chip measurement).
Prints ONE JSON line.
"""

import os
import re
import sys

# must precede the first jax import/backend touch
_n = next((int(a.split("=", 1)[1]) for a in sys.argv
           if a.startswith("--n=")), 8)
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={_n}").strip()

import json

import numpy as np

_sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _sys_path_root)

PER_SHARD = next((int(a.split("=", 1)[1]) for a in sys.argv
                  if a.startswith("--per-shard=")), 16_384)
D = 768
TOPK = 10
B = 64

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
                "pred": 1, "f16": 2, "s64": 8, "u64": 8, "f64": 8}


def collective_bytes(hlo_text: str):
    """Sum output bytes of every collective op in an HLO dump."""
    out = {}
    pat = re.compile(
        r"(\w+)\[([\d,]*)\][^=]*\s"
        r"(all-gather|all-reduce|collective-permute|all-to-all|"
        r"reduce-scatter)\(")
    for m in pat.finditer(hlo_text):
        dt, shape, op = m.group(1), m.group(2), m.group(3)
        dims = [int(x) for x in shape.split(",") if x] or [1]
        nbytes = int(np.prod(dims)) * _DTYPE_BYTES.get(dt, 4)
        out[op] = out.get(op, 0) + nbytes
    return out


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from aura_snn_rag_tpu.config import MemoryConfig
    from aura_snn_rag_tpu.memory import engine
    from aura_snn_rag_tpu.memory.sharded import (
        init_sharded_memory, retrieve_sharded, write_memories_sharded)
    from aura_snn_rag_tpu.memory.state import init_memory_state

    n = _n
    devices = jax.devices()[:n]
    mesh = Mesh(np.asarray(devices), ("data",))

    cfg = MemoryConfig(
        max_memories=PER_SHARD, feature_dim=D, k_centroids=32,
        probe_centroids=8, retrieve_k=TOPK, use_pallas_ivf=False,
        n_place_cells=16, n_grid_cells=8, n_time_cells=4)

    total = n * PER_SHARD
    rng = np.random.RandomState(0)
    feats = rng.randn(total, D).astype(np.float32)
    locs = np.zeros((total, 2), np.float32)

    # sharded bank via the public ingest path: write_memories_sharded
    # splits each [S*c, D] batch into contiguous per-shard blocks
    # (in_specs P('data') on the leading dim), so batch j carries rows
    # [s*PER_SHARD + j*c, s*PER_SHARD + (j+1)*c) for every shard s —
    # leaving shard s's local slot l = feats row s*PER_SHARD + l.
    state = init_sharded_memory(cfg, mesh, axis="data")
    blocks = feats.reshape(n, PER_SHARD, D)
    c = 8192
    for j in range(0, PER_SHARD, c):
        batch = np.concatenate([blocks[s, j:j + c] for s in range(n)])
        state = write_memories_sharded(
            cfg, mesh, state, jnp.asarray(batch),
            jnp.zeros((batch.shape[0], 2), np.float32), axis=("data",))

    queries = jnp.asarray(
        feats[rng.randint(0, total, B)]
        + 0.3 * rng.randn(B, D).astype(np.float32))

    got = retrieve_sharded(cfg, mesh, state, queries, k=TOPK, axis="data")

    # reference: ONE flat bank with all rows (brute force = exact)
    ref_cfg = MemoryConfig(
        max_memories=total, feature_dim=D, k_centroids=32,
        retrieve_k=TOPK, use_pallas_ivf=False,
        n_place_cells=16, n_grid_cells=8, n_time_cells=4)
    ref_state = init_memory_state(ref_cfg)
    ref_state = engine.bulk_load(ref_cfg, ref_state, jnp.asarray(feats),
                                 jnp.asarray(locs))
    ref = engine.retrieve_bruteforce(ref_cfg, ref_state, queries, None, TOPK)

    # map sharded global ids (shard*M + local written in cyclic order) to
    # original row ids: shard s, local slot l  ->  row l*n + s... the
    # interleaved feed wrote shard s's l-th write = inter row l*n + s
    # = feats row s*PER_SHARD + l.
    g = np.asarray(got.indices)
    shard, local = g // PER_SHARD, g % PER_SHARD
    mapped = np.where(g >= 0, shard * PER_SHARD + local, -1)
    agree = np.mean([
        len(set(a[a >= 0].tolist()) & set(b[b >= 0].tolist())) / TOPK
        for a, b in zip(mapped, np.asarray(ref.indices))])

    # collective traffic from the compiled HLO
    jitted = jax.jit(lambda st, q: retrieve_sharded(
        cfg, mesh, st, q, k=TOPK, axis="data"))
    hlo = jitted.lower(state, queries).compile().as_text()
    coll = collective_bytes(hlo)
    coll_total = sum(coll.values())
    # analytic prediction: one all_gather of [S, B, k] scores + slots +
    # [S, B, k, D] features over the axis = B·k·(D+2)·S·4 bytes (f32/i32)
    predicted = B * TOPK * (D + 2) * n * 4

    print(json.dumps({
        "metric": f"sharded retrieval correctness+collectives @ {n} shards",
        "n_shards": n, "per_shard_rows": PER_SHARD, "total_rows": total,
        "topk_agreement_vs_flat": round(float(agree), 4),
        "collective_bytes_per_batch": coll,
        "collective_bytes_total": coll_total,
        "analytic_allgather_bytes": predicted,
        "bytes_per_query": round(coll_total / B, 1),
        "batch": B,
    }))


if __name__ == "__main__":
    main()
