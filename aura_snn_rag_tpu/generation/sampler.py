"""Sampling transforms and the autoregressive decode loop.

Parity:
- temperature / top-k / top-p / repetition-penalty semantics ↔
  `SNNRAGTransformer.generate` (/root/reference/src/core/language_zone/
  snn_rag_transformer.py:166-244) and `top_p_sampling` /
  `apply_repetition_penalty` (/root/reference/src/generation/
  sampling_utils.py:4-42; sign-aware penalty: positive logits divided,
  negative multiplied);
- recent-token blocking ↔ the stable generation variant
  (aura_nemotron_cc2_pretraining.py:714-757).

TPU-native difference: the reference recomputes the full prefix every token
(NO KV cache anywhere — SURVEY §3.3). Here decode is one `lax.scan` over
steps with per-layer KV caches in the carry: O(L) per token instead of
O(L²), entirely on device.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def apply_repetition_penalty(logits: jax.Array, token_counts: jax.Array,
                             penalty: float) -> jax.Array:
    """Sign-aware repetition penalty over the vocab.

    token_counts: [V] (or [B, V]) counts of tokens seen so far; penalized
    iff count > 0. positive logits /= penalty, negative *= penalty.
    """
    seen = token_counts > 0
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def exact_topk_blockwise(logits: jax.Array, k: int,
                         block: int = 128) -> tuple:
    """Exact (values, indices) top-k via a block-max funnel.

    Same containment argument as the memory engine's flat funnel
    (engine.select_block_candidates): at most k-1 elements out-score the
    k-th best, so they occupy at most k-1 blocks, and the k-th best
    element's own block max >= its value — the top-k blocks BY MAX provably
    contain every top-k element. Replaces one sort over the full vocab
    (32k) with a VPU block-max pass + a sort over k*block (6.4k at k=50) —
    the decode scan's dominant non-matmul op at B=1.

    Exactness: returned VALUES equal `jax.lax.top_k`'s exactly; index
    order may differ from lax.top_k only between exactly-equal values
    (ties), which is sampling-distribution-identical.
    """
    V = logits.shape[-1]
    nb = -(-V // block)
    pad = nb * block - V
    x = jnp.pad(logits, [(0, 0)] * (logits.ndim - 1) + [(0, pad)],
                constant_values=NEG_INF) if pad else logits
    xb = x.reshape(*logits.shape[:-1], nb, block)
    bmax = xb.max(axis=-1)                                   # [..., nb]
    kb = min(k, nb)
    _, top_blocks = jax.lax.top_k(bmax, kb)                  # [..., kb]
    # expand winning blocks to their member lanes
    lane = jnp.arange(block)
    cand_idx = (top_blocks[..., None] * block + lane).reshape(
        *logits.shape[:-1], kb * block)                      # [..., kb*B]
    cand = jnp.take_along_axis(x, cand_idx, axis=-1)
    vals, pick = jax.lax.top_k(cand, k)
    idx = jnp.take_along_axis(cand_idx, pick, axis=-1)
    return vals, idx


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jax.Array, p) -> jax.Array:
    """Nucleus filtering: keep the smallest prefix with cumulative prob > p.

    `p` may be a Python float (static; p >= 1.0 short-circuits) or a traced
    array broadcastable to the batch dims (per-request nucleus in serving —
    no recompile per value).
    """
    if isinstance(p, (int, float)) and p >= 1.0:
        return logits
    p = jnp.asarray(p, jnp.float32)
    if p.ndim:                       # [B] per-request → broadcast over vocab
        p = p[..., None]
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens whose cumulative prob (exclusive) <= p; always keep top-1
    keep_sorted = (cum - probs) <= p
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1,
        keepdims=True)
    return jnp.where(logits < threshold, NEG_INF, logits)


def sample_token(rng: jax.Array, logits: jax.Array,
                 temperature=1.0, top_k: int = 0,
                 top_p=1.0,
                 token_counts: Optional[jax.Array] = None,
                 repetition_penalty: float = 1.0,
                 topk_impl: str = "sort") -> jax.Array:
    """logits [..., V] → sampled token ids [...].

    `temperature` and `top_p` may be Python floats (static) or traced arrays
    broadcastable to the batch dims ([B] per-request values in serving).
    `top_k` is structural (changes the lax.top_k shape) and stays static.

    When top_k > 0 the whole filter chain runs in the top-k subspace: one
    `lax.top_k` (already sorted) replaces the full-vocab nucleus SORT, the
    [..., V] NEG_INF scatter, and the [..., V] categorical — the dominant
    per-token cost of the decode scan at 32k vocab. Distribution-identical
    to filtering in vocab space (top-p after top-k only ever keeps top-k
    entries; softmax is shift/subset invariant on the survivors).
    """
    logits = logits.astype(jnp.float32)
    if token_counts is not None and repetition_penalty != 1.0:
        logits = apply_repetition_penalty(logits, token_counts,
                                          repetition_penalty)
    if isinstance(temperature, (int, float)):
        if temperature != 1.0:
            logits = logits / max(temperature, 1e-6)
    else:
        t = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)
        logits = logits / (t[..., None] if t.ndim else t)

    if top_k > 0:
        if topk_impl == "blockwise":
            vals, idx = exact_topk_blockwise(logits, top_k)
        else:
            vals, idx = jax.lax.top_k(logits, top_k)  # sorted descending
        static_p = isinstance(top_p, (int, float))
        if not (static_p and top_p >= 1.0):
            p = jnp.asarray(top_p, jnp.float32)
            if p.ndim:
                p = p[..., None]
            probs = jax.nn.softmax(vals, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep = (cum - probs) <= p               # always keeps top-1
            vals = jnp.where(keep, vals, NEG_INF)
        choice = jax.random.categorical(rng, vals, axis=-1)
        return jnp.take_along_axis(idx, choice[..., None],
                                   axis=-1)[..., 0]

    logits = top_p_filter(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1)


def generate(model, params, input_ids: jax.Array, max_new_tokens: int,
             rng: jax.Array, temperature=1.0, top_k: int = 50,
             top_p=0.9, repetition_penalty: float = 1.2,
             memory_state=None, use_memory: bool = False,
             eos_token_id: Optional[int] = None,
             prosody: Optional[jax.Array] = None,
             topk_impl: str = "sort") -> jax.Array:
    """KV-cached autoregressive generation.

    input_ids: [B, L_prompt] → returns [B, L_prompt + max_new_tokens]
    (positions after EOS are padded with EOS when eos_token_id is set).
    """
    B, L0 = input_ids.shape
    cfg = model.config
    V = cfg.vocab_size
    total_len = L0 + max_new_tokens
    assert total_len <= cfg.max_seq_len, (
        f"total {total_len} exceeds max_seq_len {cfg.max_seq_len}")

    caches = model.init_kv_caches(B, cfg.max_seq_len)
    counts = jnp.zeros((B, V), jnp.int32)
    counts = counts.at[jnp.arange(B)[:, None], input_ids].add(1)

    # ---- prefill ----
    positions = jnp.broadcast_to(jnp.arange(L0)[None, :], (B, L0))
    out, caches = model.apply(
        params, input_ids, prosody=prosody, use_memory=use_memory,
        memory_state=memory_state, positions=positions,
        kv_caches=caches, cache_index=jnp.asarray(0))
    rng, sub = jax.random.split(rng)
    next_tok = sample_token(sub, out.logits[:, -1], temperature, top_k,
                            top_p, counts, repetition_penalty,
                            topk_impl=topk_impl)

    def step(carry, rng_t):
        caches, counts, tok, pos, done = carry
        counts = counts.at[jnp.arange(B), tok].add(1)
        out, caches = model.apply(
            params, tok[:, None], use_memory=use_memory,
            memory_state=memory_state,
            positions=pos[:, None],
            kv_caches=caches, cache_index=pos[0])
        nxt = sample_token(rng_t, out.logits[:, 0], temperature, top_k,
                           top_p, counts, repetition_penalty,
                           topk_impl=topk_impl)
        if eos_token_id is not None:
            nxt = jnp.where(done, eos_token_id, nxt)
            done = done | (nxt == eos_token_id)
        return (caches, counts, nxt, pos + 1, done), tok

    done0 = jnp.zeros((B,), bool)
    if eos_token_id is not None:
        done0 = next_tok == eos_token_id
    # prefill produced token #1; scan produces the remaining n-1
    rngs = jax.random.split(rng, max(max_new_tokens - 1, 0))
    carry = (caches, counts, next_tok,
             jnp.full((B,), L0, jnp.int32), done0)
    (_, _, last, _, _), toks = jax.lax.scan(step, carry, rngs)
    if max_new_tokens > 1:
        generated = jnp.concatenate(
            [jnp.moveaxis(toks, 0, 1), last[:, None]], axis=1)
    else:
        generated = last[:, None]
    return jnp.concatenate([input_ids, generated], axis=1)
