"""Pipeline-parallel dryrun at xl scale on the virtual CPU mesh.

VERDICT r2 #8 evidence: the beyond-reference xl preset (1024D/16L/16H/4096,
~410M with embeddings; the 16-layer trunk alone is ~200M) actually runs
under pipeline parallelism — 4 GPipe stages x 4 REAL TransformerLayers per
stage on a ('stage','data') = (4, 2) mesh, forward + backward, with
per-stage grads landing sharded on their stage's devices.

Run:  python examples/dryrun_pp_xl.py          (forces 8 virtual CPU devs)
Logs: runs/pp_xl_dryrun.json
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    # must happen before the first backend touch (jax may be preimported
    # by sitecustomize with a pinned platform — env vars alone don't help)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from aura_snn_rag_tpu.config import get_xl_config
from aura_snn_rag_tpu.models.layers import TransformerLayer
from aura_snn_rag_tpu.parallel.pipeline import (
    pipeline_apply, split_microbatches, stack_stage_params)

STAGES = 4
MICRO = 4
B, L = 8, 128          # small batch/seq: this validates sharding + grads,
                       # not throughput (CPU mesh)


def main():
    cfg = get_xl_config().model
    cfg = dataclasses.replace(cfg, dropout=0.0)
    layers_per_stage = cfg.num_layers // STAGES
    devices = np.array(jax.devices()[:8]).reshape(STAGES, 2)
    mesh = Mesh(devices, ("stage", "data"))

    layer = TransformerLayer(cfg, deterministic=True)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((B // MICRO, L, cfg.embedding_dim), jnp.float32)

    # independent params for all 16 xl layers, grouped into 4 stages
    t0 = time.time()
    per_stage = []
    for s in range(STAGES):
        stage_layers = []
        for i in range(layers_per_stage):
            rng, sub = jax.random.split(rng)
            stage_layers.append(layer.init(sub, x0)["params"])
        # stage params = stacked [layers_per_stage, ...] so the block_fn
        # scans its own sub-stack
        per_stage.append(jax.tree.map(lambda *xs: jnp.stack(xs),
                                      *stage_layers))
    stage_params = stack_stage_params(per_stage, mesh)   # [S, Lps, ...]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(stage_params))
    init_s = time.time() - t0

    def block_fn(params, x):
        def body(h, layer_params):
            out, _ = layer.apply({"params": layer_params}, h)
            return out, None
        y, _ = jax.lax.scan(body, x, params)
        return y

    def loss_fn(stage_params, mbs):
        out = pipeline_apply(block_fn, stage_params, mbs, mesh)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    rngd = np.random.RandomState(0)
    batch = jnp.asarray(rngd.randn(B, L, cfg.embedding_dim)
                        .astype(np.float32)) * 0.02
    mbs = split_microbatches(batch, MICRO)

    t0 = time.time()
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    loss, grads = grad_fn(stage_params, mbs)
    loss = float(loss)
    compile_s = time.time() - t0

    t0 = time.time()
    loss2, grads = grad_fn(stage_params, mbs)
    jax.block_until_ready(grads)
    step_s = time.time() - t0

    gleaves = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in gleaves), "non-finite grads"
    gnorm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                               for g in gleaves)))
    assert gnorm > 0, "zero gradient through the pipeline"
    # per-stage grads are sharded over the stage axis like the params
    spec = gleaves[0].sharding.spec
    record = {
        "preset": "xl", "d_model": cfg.embedding_dim,
        "layers": cfg.num_layers, "stages": STAGES,
        "microbatches": MICRO, "mesh": dict(mesh.shape),
        "trunk_params": n_params, "loss": loss, "loss_repeat": float(loss2),
        "grad_norm": gnorm, "grad_sharding_spec": str(spec),
        "init_s": round(init_s, 1), "compile_s": round(compile_s, 1),
        "step_s": round(step_s, 2),
        "bubble_fraction": (STAGES - 1) / (MICRO + STAGES - 1),
    }
    os.makedirs("runs", exist_ok=True)
    with open("runs/pp_xl_dryrun.json", "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    print("PP xl dryrun OK")


if __name__ == "__main__":
    main()
