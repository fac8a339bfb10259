"""Autoregressive decode throughput: KV-cached vs reference-style recompute.

The reference has NO KV cache — every generated token recomputes the full
prefix (snn_rag_transformer.py:196-242, SURVEY §3.3). This measures the
cached decode and the recompute-per-token strategy on the same model to
quantify the win.

    python benchmarks/bench_generation.py [--preset test] [--new-tokens 64]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="test")
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aura_snn_rag_tpu import config as cfg_mod
    from aura_snn_rag_tpu.generation import generate, sample_token
    from aura_snn_rag_tpu.models import HippocampalTransformer

    cfg = getattr(cfg_mod, f"get_{args.preset}_config")().model
    cfg = dataclasses.replace(cfg, dropout=0.0)
    model = HippocampalTransformer(cfg)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size,
                                  (args.batch, args.prompt_len)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)

    def fence(x):
        np.asarray(x)[:1]

    # --- KV-cached decode (ours) ---
    gen = jax.jit(lambda p, i, r: generate(
        model, p, i, args.new_tokens, r, top_k=50))
    out = gen(params, ids, jax.random.PRNGKey(1))
    fence(out)
    t0 = time.perf_counter()
    out = gen(params, ids, jax.random.PRNGKey(2))
    fence(out)
    cached_s = time.perf_counter() - t0
    cached_tps = args.batch * args.new_tokens / cached_s

    # --- reference-style: full recompute per token ---
    @jax.jit
    def recompute_step(p, ctx, r):
        o, _ = model.apply(p, ctx, use_memory=True)
        return sample_token(r, o.logits[:, -1], top_k=50)

    ctx = ids
    tok = recompute_step(params, ctx, jax.random.PRNGKey(3))
    fence(tok)  # warm both shapes? shapes grow per step -> recompile each
    # limit to a few steps with a FIXED window to avoid per-step recompiles
    window = args.prompt_len
    t0 = time.perf_counter()
    steps = min(args.new_tokens, 16)
    for s in range(steps):
        tok = recompute_step(params, ctx[:, -window:],
                             jax.random.PRNGKey(4 + s))
        ctx = jnp.concatenate([ctx[:, 1:], tok[:, None]], axis=1)
    fence(ctx)
    recompute_s = (time.perf_counter() - t0) / steps * args.new_tokens
    recompute_tps = args.batch * args.new_tokens / recompute_s

    print(json.dumps({
        "cached_tokens_per_s": round(cached_tps, 1),
        "recompute_tokens_per_s": round(recompute_tps, 1),
        "speedup": round(cached_tps / recompute_tps, 2),
        "batch": args.batch,
        "new_tokens": args.new_tokens,
    }))


if __name__ == "__main__":
    main()
