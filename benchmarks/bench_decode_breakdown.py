"""Decode per-token cost attribution: forward vs sampler vs dtype.

VERDICT r2 #5 prep: before fusing anything, attribute the 1.11 ms/token
(test preset, B=1) across the decode scan's stages. Variants:

  full       generate() as benched (top-k 50 + nucleus + penalty)
  greedy     argmax sampling (top_k=0, top_p=1, penalty off) — isolates
             the lax.top_k(32k) + counts-scatter cost
  forward    the scan with a constant next-token (no sampler at all) —
             isolates pure per-token model cost
  bf16       full, with params cast to bf16 — isolates the f32 weight-read
             bandwidth share

Run on chip:  python benchmarks/bench_decode_breakdown.py [--preset test]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import functools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="test")
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from aura_snn_rag_tpu import config as cfg_mod
    from aura_snn_rag_tpu.generation import generate
    from aura_snn_rag_tpu.models import HippocampalTransformer

    cfg = getattr(cfg_mod, f"get_{args.preset}_config")().model
    cfg = dataclasses.replace(cfg, dropout=0.0)
    model = HippocampalTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))
    B, T = args.batch, args.new_tokens
    ids = jnp.asarray(np.random.RandomState(0).randint(
        1, cfg.vocab_size, (B, args.prompt_len)), jnp.int32)

    def fence(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

    def timed(name, fn, *a):
        out = fn(*a)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a)
        fence(out)
        dt = (time.perf_counter() - t0) / args.reps
        ms_tok = dt * 1e3 / T
        print(f"{name:22s} {ms_tok:7.3f} ms/token   "
              f"{B * T / dt:8.0f} tok/s", flush=True)
        return ms_tok

    rng = jax.random.PRNGKey(1)

    full = jax.jit(functools.partial(
        generate, model, max_new_tokens=T, temperature=0.8, top_k=50,
        top_p=0.9, repetition_penalty=1.2))
    r_full = timed("full (topk+p+penalty)", lambda: full(
        params, input_ids=ids, rng=rng))

    greedy = jax.jit(functools.partial(
        generate, model, max_new_tokens=T, temperature=1.0, top_k=1,
        top_p=1.0, repetition_penalty=1.0))
    r_greedy = timed("greedy (top_k=1)", lambda: greedy(
        params, input_ids=ids, rng=rng))

    # forward-only: scan the single-token step with a constant token —
    # measures the per-token model cost with zero sampler work
    caches = model.init_kv_caches(B, cfg.max_seq_len)
    L0 = ids.shape[1]

    @jax.jit
    def forward_only(params, ids):
        pos = jnp.broadcast_to(jnp.arange(L0)[None, :], (B, L0))
        out, caches2 = model.apply(params, ids, positions=pos,
                                   kv_caches=caches,
                                   cache_index=jnp.asarray(0))

        def step(carry, t):
            caches, tok, pos = carry
            out, caches = model.apply(params, tok[:, None],
                                      positions=pos[:, None],
                                      kv_caches=caches, cache_index=pos[0])
            nxt = out.logits[:, 0, :1].astype(jnp.int32)[:, 0] % 100 + 1
            return (caches, nxt, pos + 1), ()

        carry = (caches2, ids[:, -1], jnp.full((B,), L0, jnp.int32))
        (c, tok, _), _ = jax.lax.scan(step, carry, jnp.arange(T - 1))
        return tok

    r_fwd = timed("forward only", lambda: forward_only(params, ids))

    bf16_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    r_bf16 = timed("full, bf16 params", lambda: full(
        bf16_params, input_ids=ids, rng=rng))

    blockwise = jax.jit(functools.partial(
        generate, model, max_new_tokens=T, temperature=0.8, top_k=50,
        top_p=0.9, repetition_penalty=1.2, topk_impl="blockwise"))
    r_blk = timed("full, blockwise topk", lambda: blockwise(
        params, input_ids=ids, rng=rng))
    r_best = timed("bf16 + blockwise", lambda: blockwise(
        bf16_params, input_ids=ids, rng=rng))

    print(json.dumps({
        "preset": args.preset, "batch": B, "new_tokens": T,
        "ms_per_token": {"full": r_full, "greedy": r_greedy,
                         "forward_only": r_fwd, "bf16_full": r_bf16,
                         "blockwise_topk": r_blk,
                         "bf16_blockwise": r_best},
        "sampler_share_ms": round(r_full - r_fwd, 4),
        "f32_weight_read_share_ms": round(r_full - r_bf16, 4),
    }))


if __name__ == "__main__":
    main()
