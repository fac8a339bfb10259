"""Decode throughput benchmark: KV-cached generation tokens/s at B=1/8/32.

VERDICT r1 #5: serving needed per-request params (fixed in
generation/serving.py) and a decode-throughput benchmark. The reference has
no KV cache at all (SURVEY §3.3 — full-prefix recompute per token), so the
baseline here is the reference-style recompute loop at B=1.

    python benchmarks/bench_decode.py [--preset test] [--new-tokens 64]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def fence(x):
    """Tunnel-safe sync: block_until_ready does not fence on axon."""
    np.asarray(jax_arr_leaf(x))


def jax_arr_leaf(x):
    import jax
    return jax.tree.leaves(x)[0].ravel()[:1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="test")
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--batches", default="1,8,32")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from aura_snn_rag_tpu import config as cfg_mod
    from aura_snn_rag_tpu.generation import generate
    from aura_snn_rag_tpu.models import HippocampalTransformer

    import dataclasses
    cfg = getattr(cfg_mod, f"get_{args.preset}_config")().model
    cfg = dataclasses.replace(cfg, dropout=0.0)
    model = HippocampalTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))

    results = {}
    for B in [int(b) for b in args.batches.split(",")]:
        ids = jnp.asarray(
            np.random.RandomState(0).randint(
                1, cfg.vocab_size, (B, args.prompt_len)), jnp.int32)

        fn = jax.jit(lambda p, i, r: generate(
            model, p, i, args.new_tokens, r, temperature=0.8))
        out = fn(params, ids, jax.random.PRNGKey(1))
        fence(out)                                   # compile + warm
        times = []
        for rep in range(args.reps):
            t0 = time.time()
            out = fn(params, ids, jax.random.PRNGKey(rep))
            fence(out)
            times.append(time.time() - t0)
        dt = min(times)
        tok_s = B * args.new_tokens / dt
        results[f"B{B}"] = {"tokens_per_s": round(tok_s, 1),
                            "latency_s": round(dt, 4),
                            "per_token_ms": round(1000 * dt / args.new_tokens, 3)}
        print(f"B={B}: {tok_s:,.0f} tok/s ({dt*1000:.0f} ms for "
              f"{args.new_tokens} new tokens)", flush=True)

    print(json.dumps({"metric": "KV-cached decode throughput",
                      "preset": args.preset,
                      "new_tokens": args.new_tokens, **results}), flush=True)


if __name__ == "__main__":
    main()
