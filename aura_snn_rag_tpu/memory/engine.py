"""Pure jittable operations on `MemoryState`: write / retrieve / decay / rebuild.

Behavioral parity with `/root/reference/src/core/hippocampal.py` (SURVEY.md
§3.4), redesigned for TPU:

- WRITE (`write_memories`) ↔ `create_episodic_memory` (:195-243): FIFO slot,
  strength/timestamp row, online nearest-centroid assignment with incremental
  update eta = 1/count (:217-230). Batched: a whole [B, D] batch is written in
  one `lax.scan` (the reference loops in Python per row).
- READ (`retrieve`) ↔ `retrieve_similar_memories` (:245-319): probe the 8
  nearest centroids, score candidates with
  (0.5·cosine + 0.3·spatial + 0.2·temporal) · strength (:300-303), top-k.
  Candidates come from the IVF clustered store — P contiguous [C, D] HBM
  blocks per query — instead of the reference's boolean-mask Python loop
  (:266-267). Batched over queries in one call (fixes the per-batch-item
  loop defect, SURVEY §2.11). The reference's candidate/metadata shape
  mismatch bug (:287 vs :277) is fixed by construction: all per-candidate
  tensors are gathered through the same `slots` indices.
- DECAY (`decay_memories`) ↔ `decay_memories` (:321-343).
- REBUILD (`rebuild_centroids`) ↔ `rebuild_centroids` (:345-377): sample-k
  init + configurable Lloyd iterations (reference: 1) using one big matmul
  for assignment (MXU) + `segment_sum` for means, then a vectorized
  sort-by-cluster scatter to build the static bucketed layout.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from aura_snn_rag_tpu.config import MemoryConfig
from aura_snn_rag_tpu.memory.state import MemoryState

NEG_INF = -1e30


def _ivf_kernel_ok() -> bool:
    """Fused Pallas IVF kernel availability (TPU backend only)."""
    try:
        from aura_snn_rag_tpu.ops.pallas.ivf_scan import pallas_available
        return pallas_available()
    except ImportError:  # pragma: no cover
        return False


class RetrievalResult(NamedTuple):
    indices: jax.Array    # [B, k] bank slots (-1 = no hit)
    scores: jax.Array     # [B, k] combined scores
    features: jax.Array   # [B, k, D] raw stored features


def _l2norm(x, axis=-1, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def _to_coarse(x_norm, dtype):
    """Cast an L2-normalized row block to the coarse-scan storage dtype
    at GLOBAL scale (dequant = q/127; per-row variant below).

    int8 uses symmetric 127-scale quantization (values in [-1, 1] by
    construction); anything else is a plain cast (bf16 path)."""
    if dtype == jnp.int8:
        return jnp.clip(jnp.round(x_norm * 127.0), -127, 127).astype(dtype)
    return x_norm.astype(dtype)


def _to_coarse_rows(x_norm, dtype):
    """Per-row max-abs quantization -> (rows, scale [rows'] f32).

    Components of an L2-normalized D=768 row are ~1/sqrt(D) ~ 0.036, so
    the global 127 scale uses only ~±5 int8 levels; scaling each row by
    its own max-abs uses the full ±127 range (~7× less quantization
    noise). Dequant: x ≈ q * scale / 127 (scale == 1.0 reproduces the
    global convention, so zero-initialized banks stay compatible)."""
    if dtype == jnp.int8:
        scale = jnp.maximum(
            jnp.max(jnp.abs(x_norm), axis=-1, keepdims=True), 1e-12)
        q = jnp.clip(jnp.round(x_norm * (127.0 / scale)),
                     -127, 127).astype(dtype)
        return q, jnp.squeeze(scale, -1).astype(jnp.float32)
    ones = jnp.ones(x_norm.shape[:-1], jnp.float32)
    return x_norm.astype(dtype), ones


def _coarse_cos(bank_coarse, qn, row_scale=None):
    """[M, D?] coarse bank × [B, D] f32 normalized queries → cosine [B, M].

    int8 banks run the int8×int8 MXU path (2× rate, half the HBM read of
    bf16). row_scale [M] is the bank's per-row dequant scale
    (state.coarse_scale); queries quantize per-query max-abs, and the two
    rank-1 scale factors ride outside the matmul — exact dequantization
    at O(B·M) multiplies the fused epilogue absorbs."""
    if bank_coarse.dtype == jnp.int8:
        qmax = jnp.maximum(jnp.max(jnp.abs(qn), axis=-1, keepdims=True),
                           1e-12)                                # [B, 1]
        q8 = jnp.clip(jnp.round(qn * (127.0 / qmax)),
                      -127, 127).astype(jnp.int8)
        acc = jnp.einsum("md,bd->bm", bank_coarse, q8,
                         preferred_element_type=jnp.int32)
        cos = acc.astype(jnp.float32) * (qmax * (1.0 / (127.0 * 127.0)))
        if row_scale is not None:
            cos = cos * row_scale[None, :]
        return cos
    return jnp.einsum("md,bd->bm", bank_coarse,
                      qn.astype(bank_coarse.dtype)).astype(jnp.float32)


# NOTE on top-k strategy (measured on TPU v5e via axon): exact
# `lax.top_k` over a [32, 1M] row costs ~20 ms (sort-bound); a block-local
# two-stage exact variant is no better; `jax.lax.approx_max_k` (the TPU
# hardware MIPS path) is ~an order of magnitude cheaper and its recall
# slack is absorbed by the exact f32 rerank funnel.


# --------------------------------------------------------------------------
# WRITE
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def write_memories(config: MemoryConfig, state: MemoryState,
                   features: jax.Array, locations: jax.Array) -> MemoryState:
    """One-shot write of a [B, D] batch (with [B, S] locations) into the bank.

    Sequential within the batch (centroid counts / ring cursors carry), one
    fused scan — donated buffers make the row updates in-place HBM scatters.
    """
    features = features.astype(state.features.dtype)
    locations = locations.astype(state.locations.dtype)
    C = state.bucket_capacity
    M = state.max_memories

    def write_one(st: MemoryState, row):
        f, loc = row
        idx = (st.count % M).astype(jnp.int32)
        gen = st.count

        # nearest centroid (only meaningful when the index is live)
        d2 = jnp.sum((st.centroids - f) ** 2, axis=-1)          # [K]
        cid = jnp.argmin(d2).astype(jnp.int32)
        assign = st.index_ready
        cid_stored = jnp.where(assign, cid, -1)

        # incremental centroid update, eta = 1/n (hippocampal.py:227-228)
        new_count = st.centroid_counts[cid] + 1.0
        eta = 1.0 / jnp.maximum(new_count, 1.0)
        updated_c = (1.0 - eta) * st.centroids[cid] + eta * f
        centroids = st.centroids.at[cid].set(
            jnp.where(assign, updated_c, st.centroids[cid]))
        centroid_counts = st.centroid_counts.at[cid].add(
            jnp.where(assign, 1.0, 0.0))

        # clustered-store ring append (all scoring metadata cluster-aligned)
        pos = st.bucket_fill[cid] % C
        fn = _l2norm(f).astype(st.clustered.dtype)
        clustered = st.clustered.at[cid, pos].set(
            jnp.where(assign, fn, st.clustered[cid, pos]))
        cluster_slot = st.cluster_slot.at[cid, pos].set(
            jnp.where(assign, idx, st.cluster_slot[cid, pos]))
        cluster_gen = st.cluster_gen.at[cid, pos].set(
            jnp.where(assign, gen, st.cluster_gen[cid, pos]))
        cluster_ts = st.cluster_ts.at[cid, pos].set(
            jnp.where(assign, st.step, st.cluster_ts[cid, pos]))
        cluster_decay = st.cluster_decay.at[cid, pos].set(
            jnp.where(assign, st.decay_accum, st.cluster_decay[cid, pos]))
        cluster_loc = st.cluster_loc.at[cid, pos].set(
            jnp.where(assign, loc, st.cluster_loc[cid, pos]))
        bucket_fill = st.bucket_fill.at[cid].add(
            jnp.where(assign, 1, 0).astype(jnp.int32))

        qrow, qscale = _to_coarse_rows(_l2norm(f), st.features_nb16.dtype)
        return st._replace(
            features=st.features.at[idx].set(f),
            features_nb16=st.features_nb16.at[idx].set(qrow),
            coarse_scale=st.coarse_scale.at[idx].set(qscale),
            locations=st.locations.at[idx].set(loc),
            strength=st.strength.at[idx].set(1.0),
            timestamp=st.timestamp.at[idx].set(st.step),
            centroid_id=st.centroid_id.at[idx].set(cid_stored),
            slot_gen=st.slot_gen.at[idx].set(gen),
            centroids=centroids,
            centroid_counts=centroid_counts,
            clustered=clustered,
            cluster_slot=cluster_slot,
            cluster_gen=cluster_gen,
            cluster_ts=cluster_ts,
            cluster_decay=cluster_decay,
            cluster_loc=cluster_loc,
            bucket_fill=bucket_fill,
            count=st.count + 1,
        ), None

    state, _ = jax.lax.scan(write_one, state, (features, locations))
    return state


@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def bulk_load(config: MemoryConfig, state: MemoryState,
              features: jax.Array, locations: jax.Array) -> MemoryState:
    """Vectorized bulk ingest of [N, D] rows into an EMPTY bank (N <= M).

    Benchmark/ingestion fast path: fills bank rows directly (no per-row
    centroid bookkeeping); call `rebuild_centroids` afterwards to build the
    index. Semantically equivalent to N one-shot writes at the current step.
    """
    N = features.shape[0]
    f32 = state.features.dtype
    qrows, qscales = _to_coarse_rows(_l2norm(features.astype(f32)),
                                     state.features_nb16.dtype)
    return state._replace(
        features=state.features.at[:N].set(features.astype(f32)),
        features_nb16=state.features_nb16.at[:N].set(qrows),
        coarse_scale=state.coarse_scale.at[:N].set(qscales),
        locations=state.locations.at[:N].set(locations.astype(f32)),
        strength=state.strength.at[:N].set(1.0),
        timestamp=state.timestamp.at[:N].set(state.step),
        slot_gen=state.slot_gen.at[:N].set(
            state.count + jnp.arange(N, dtype=jnp.int32)),
        count=state.count + N,
    )


# --------------------------------------------------------------------------
# SCORING (shared by both retrieval paths)
# --------------------------------------------------------------------------

def _combined_score(config: MemoryConfig, state: MemoryState,
                    cos: jax.Array, slots: jax.Array,
                    query_loc: Optional[jax.Array]) -> jax.Array:
    """(w_c·cos + w_s·spatial + w_t·temporal) · strength, gathered via slots.

    slots: [..., N] bank indices (clipped to valid range by the caller).
    query_loc: [B, S] or None; cos/slots lead with the same batch dims.
    """
    strength = state.strength[slots]
    ages = (state.step - state.timestamp[slots]) * config.seconds_per_step
    temporal = jnp.exp(-jnp.maximum(ages, 0.0) / config.temporal_tau)

    if query_loc is not None:
        mem_loc = state.locations[slots]                       # [..., N, S]
        d = jnp.sqrt(jnp.sum(
            (mem_loc - query_loc[:, None, :]) ** 2, axis=-1) + 1e-12)
        spatial = 1.0 / (1.0 + d)
    else:
        spatial = jnp.zeros_like(cos)

    return (config.w_cosine * cos + config.w_spatial * spatial
            + config.w_temporal * temporal) * strength


# --------------------------------------------------------------------------
# RETRIEVE — IVF (centroid-probed) path
# --------------------------------------------------------------------------

def _annex_coarse(config: MemoryConfig, state: MemoryState, qn: jax.Array,
                  query_locations: Optional[jax.Array], kcap: int):
    """Coarse-score the reserved overflow annex (last G clusters).

    The annex holds rows the capacity spill could not place; its clusters
    have sentinel centroids so probing never reaches them. One contiguous
    [G·C, D] bf16 matmul scores every annex entry with the same combined
    metric; returns its top-kcap (scores, slots, valid) for the funnel, or
    None when no annex is configured.
    """
    K, C = state.k_centroids, state.bucket_capacity
    G = min(config.overflow_buckets, K // 4)
    if G == 0:
        return None
    Ku = K - G
    D = state.clustered.shape[-1]
    a_feats = state.clustered[Ku:].reshape(G * C, D)
    cos = jnp.einsum("ad,bd->ba", a_feats,
                     qn.astype(state.clustered.dtype)).astype(jnp.float32)
    strength = jnp.exp(state.decay_accum
                       - state.cluster_decay[Ku:]).reshape(-1)
    ages = (state.step - state.cluster_ts[Ku:]).reshape(-1) \
        * config.seconds_per_step
    temporal = jnp.exp(-jnp.maximum(ages, 0.0) / config.temporal_tau)
    gens = state.cluster_gen[Ku:].reshape(-1)
    valid = (gens >= 0) & (gens >= state.count - state.max_memories)
    if query_locations is not None:
        locs = state.cluster_loc[Ku:].reshape(G * C, -1)
        d = jnp.sqrt(jnp.sum(
            (locs[None] - query_locations[:, None]) ** 2, axis=-1) + 1e-12)
        spatial = 1.0 / (1.0 + d)                       # [B, G*C]
    else:
        spatial = 0.0
    comb = ((config.w_cosine * cos + config.w_spatial * spatial
             + config.w_temporal * temporal[None, :]) * strength[None, :])
    comb = jnp.where(valid[None, :], comb, NEG_INF)
    kcap = min(kcap, comb.shape[-1])
    sc, pick = jax.lax.top_k(comb, kcap)
    slots_row = jnp.maximum(state.cluster_slot[Ku:].reshape(-1), 0)
    sl = slots_row[pick]
    return sc, sl.astype(jnp.int32), sc > NEG_INF / 2




@functools.partial(jax.jit, static_argnums=0)
def build_ivf_aux(config: MemoryConfig, state: MemoryState) -> jax.Array:
    """Precompute the fused-kernel metadata sidecar ([K, 8, C] f32).

    Row 0 = multiplicative term on cosine (w_cos·strength), row 1 = additive
    term (w_t·temporal·strength, −inf when invalid), row 2 = bank slot of the
    entry, rows 3..7 = padding (8-sublane DMA tiles). A pure function of the
    bank state: serving loops and benchmarks can build it ONCE per state
    mutation and pass it to `retrieve(..., aux=...)`, removing the [K, 8, C]
    rebuild (exp over K·C elements + a ~3·K·C·4-byte materialization) from
    every query dispatch. `HippocampalFormation.retrieve_batch` caches it
    keyed on state identity.
    """
    strength_all = jnp.exp(state.decay_accum - state.cluster_decay)
    ages_all = (state.step - state.cluster_ts) * config.seconds_per_step
    temporal_all = jnp.exp(
        -jnp.maximum(ages_all, 0.0) / config.temporal_tau)
    valid_all = ((state.cluster_gen >= 0)
                 & (state.cluster_gen >= state.count - state.max_memories))
    aux_add = (config.w_temporal * temporal_all * strength_all
               + jnp.where(valid_all, 0.0, NEG_INF))
    Kc, Cc = aux_add.shape
    return jnp.concatenate([
        (config.w_cosine * strength_all)[:, None],
        aux_add[:, None],
        state.cluster_slot.astype(jnp.float32)[:, None],
        jnp.zeros((Kc, 5, Cc), jnp.float32)], axis=1)


@functools.partial(jax.jit, static_argnums=(0, 4))
def retrieve(config: MemoryConfig, state: MemoryState, queries: jax.Array,
             query_locations: Optional[jax.Array] = None,
             k: int = 5, aux: Optional[jax.Array] = None) -> RetrievalResult:
    """Batched approximate retrieval via the centroid index.

    queries: [B, D]; query_locations: [B, S] or None. Returns top-k per query.

    Per query: nearest-P centroid scan ([B, K] matmul), fetch P contiguous
    [C, D] blocks from the clustered store, score all P·C candidates with the
    combined metric, mask invalid/stale entries, single top-k.
    """
    G = min(config.overflow_buckets, state.k_centroids // 4)
    P = min(config.probe_centroids, state.k_centroids - G)
    qn = _l2norm(queries)                                       # [B, D]

    # nearest centroids by L2: argmin ||c - q||^2 = argmin ||c||^2 - 2 q·c
    c2 = jnp.sum(state.centroids ** 2, axis=-1)                 # [K]
    qc = queries @ state.centroids.T                            # [B, K] (MXU)
    cdist = c2[None, :] - 2.0 * qc
    _, top_c = jax.lax.top_k(-cdist, P)                         # [B, P]

    B = queries.shape[0]
    slots_raw = state.cluster_slot[top_c]                       # [B, P, C]
    # FIFO liveness: slot g%M holds generation g iff g >= count - M
    gens = state.cluster_gen[top_c]
    valid = (gens >= 0) & (gens >= state.count - state.max_memories)
    slots = jnp.maximum(slots_raw, 0)

    kk = min(max(config.rerank_candidates, 4 * k),
             int(top_c.shape[1]) * state.bucket_capacity)
    if (config.use_pallas_ivf and _ivf_kernel_ok()
            and query_locations is None):
        # v2 fused kernel: gather + metadata score + per-probe EXACT top-k
        # in one HBM pass. The union of per-probe top-k contains the global
        # top-k over all probed candidates, so this funnel has no
        # approx_max_k recall slack and no [B, P, C] intermediates.
        from aura_snn_rag_tpu.ops.pallas.ivf_scan import (
            KPAD, default_interpret, ivf_candidates, ivf_retrieve_fused,
            ivf_topk_scores)
        if aux is None:
            aux = build_ivf_aux(config, state)
        C = state.bucket_capacity
        if (config.ivf_kernel == "v3r" and P * C >= KPAD
                and state.max_memories % 8 == 0 and k <= KPAD):
            # v3r: the whole retrieval (coarse scan + funnel + exact f32
            # rerank + final top-k) finishes in ONE kernel; nothing left
            # for XLA but the output feature gather.
            kk3 = -(-kk // KPAD) * KPAD
            s, sl = ivf_retrieve_fused(
                state.clustered, aux, state.features, qn, top_c, kk3, k,
                interpret=default_interpret())
            scores = s[:, :k]
            out_slots = sl[:, :k]
            # annex funnel is kk-wide like every other merge path: a k-wide
            # coarse funnel loses near-tie annex rows that the exact f32
            # rerank would promote (ADVICE r2 medium)
            annex = _annex_coarse(config, state, qn, None, kk3)
            if annex is not None:
                # exact-rerank the annex's coarse top-kk in XLA (tiny) and
                # merge with the kernel's already-exact output by score
                a_s, a_sl, a_valid = annex
                a_feats = state.features[a_sl]
                a_cos = jnp.einsum(
                    "bkd,bd->bk",
                    _l2norm(a_feats.astype(jnp.float32)), qn,
                    precision=jax.lax.Precision.HIGHEST)
                a_exact = _combined_score(config, state, a_cos, a_sl, None)
                a_exact = jnp.where(a_valid, a_exact, NEG_INF)
                all_s = jnp.concatenate([scores, a_exact], axis=1)
                all_sl = jnp.concatenate([out_slots, a_sl], axis=1)
                scores, pick2 = jax.lax.top_k(all_s, k)
                out_slots = jnp.take_along_axis(all_sl, pick2, axis=1)
            hit = scores > NEG_INF / 2
            out_slots = jnp.where(hit, out_slots, -1)
            feats = state.features[jnp.maximum(out_slots, 0)]
            feats = jnp.where(hit[..., None], feats, 0.0)
            return RetrievalResult(out_slots, jnp.where(hit, scores, 0.0),
                                   feats)
        if config.ivf_kernel == "v3" and P * C >= KPAD:
            # v3: the kernel itself emits the global top-kk candidates
            # (sorted, exact over all probed entries) — no XLA funnel.
            kk = -(-kk // KPAD) * KPAD                 # lane-aligned
            combined, sl = ivf_candidates(state.clustered, aux, qn, top_c,
                                          kk, interpret=default_interpret())
            slots = jnp.maximum(sl, 0)
            valid = combined > NEG_INF / 2
        else:
            per_k = min(max(k, -(-kk // P)), state.bucket_capacity)
            sc, sl = ivf_topk_scores(state.clustered, aux, qn, top_c, per_k,
                                     interpret=default_interpret())
            combined = sc[:, :, :per_k].reshape(B, -1)
            slots = jnp.maximum(sl[:, :, :per_k], 0).reshape(B, -1)
            valid = combined > NEG_INF / 2
    else:
        if config.use_pallas_ivf and _ivf_kernel_ok():
            # fused gather+dot kernel: one HBM pass over the probed blocks
            from aura_snn_rag_tpu.ops.pallas.ivf_scan import (
                default_interpret, ivf_scan_scores)
            cos = ivf_scan_scores(state.clustered, qn, top_c,
                                  interpret=default_interpret())  # [B,P,C]
        else:
            blocks = state.clustered[top_c]                     # [B,P,C,D]
            cos = jnp.einsum("bpcd,bd->bpc", blocks.astype(jnp.float32), qn)

        ts = state.cluster_ts[top_c]
        gdecay = state.cluster_decay[top_c]
        strength = jnp.exp(state.decay_accum - gdecay)
        ages = (state.step - ts) * config.seconds_per_step
        temporal = jnp.exp(-jnp.maximum(ages, 0.0) / config.temporal_tau)
        if query_locations is not None:
            locs = state.cluster_loc[top_c]                     # [B,P,C,S]
            d = jnp.sqrt(jnp.sum(
                (locs - query_locations[:, None, None, :]) ** 2, axis=-1)
                + 1e-12)
            spatial = 1.0 / (1.0 + d)
        else:
            spatial = jnp.zeros_like(cos)
        combined = (config.w_cosine * cos + config.w_spatial * spatial
                    + config.w_temporal * temporal) * strength

        combined = combined.reshape(B, -1)
        slots = slots.reshape(B, -1)
        valid = valid.reshape(B, -1)
        combined = jnp.where(valid, combined, NEG_INF)

    # merge the overflow annex's coarse top-kk into the funnel (spill
    # drops otherwise cost ~2-3% recall@10 at 1M — see rebuild_centroids)
    annex = _annex_coarse(config, state, qn, query_locations, kk)
    if annex is not None:
        a_s, a_sl, a_valid = annex
        combined = jnp.concatenate([combined, a_s], axis=1)
        slots = jnp.concatenate([slots, a_sl], axis=1)
        valid = jnp.concatenate([valid, a_valid], axis=1)

    # Coarse top-k' on bf16 scores, then exact f32 rerank from the bank
    # (standard IVF+rerank: the bf16 clustered scan is bandwidth-optimal but
    # cannot resolve near-tie cosines; the rerank restores exactness on the
    # survivors at negligible cost).
    if combined.shape[-1] <= kk:
        cand_slots, cand_valid = slots, valid
    elif combined.shape[-1] <= 4096:
        # narrow row (v2 per-probe funnel): exact top-k is cheap
        _, pick = jax.lax.top_k(combined, kk)
        cand_slots = jnp.take_along_axis(slots, pick, axis=1)
        cand_valid = jnp.take_along_axis(valid, pick, axis=1)
    else:
        # the IVF candidate row is wide (probe×capacity); the hardware
        # top-k's recall slack binds here — use the configured high target
        _, pick = jax.lax.approx_max_k(
            combined, kk, recall_target=config.ivf_funnel_recall)
        cand_slots = jnp.take_along_axis(slots, pick, axis=1)
        cand_valid = jnp.take_along_axis(valid, pick, axis=1)

    cand_feats = state.features[cand_slots]                      # [B, k', D]
    # HIGHEST precision: default matmul precision is bf16 on TPU (and on this
    # XLA build even on CPU); the rerank exists to resolve near-ties, so it
    # must run at true f32.
    exact_cos = jnp.einsum(
        "bkd,bd->bk", _l2norm(cand_feats.astype(jnp.float32)), qn,
        precision=jax.lax.Precision.HIGHEST)
    exact = _combined_score(config, state, exact_cos, cand_slots,
                            query_locations)
    exact = jnp.where(cand_valid, exact, NEG_INF)

    scores, pick2 = jax.lax.top_k(exact, k)                      # [B, k]
    out_slots = jnp.take_along_axis(cand_slots, pick2, axis=1)
    hit = scores > NEG_INF / 2
    out_slots = jnp.where(hit, out_slots, -1)
    feats = jnp.take_along_axis(cand_feats, pick2[..., None], axis=1)
    feats = jnp.where(hit[..., None], feats, 0.0)
    return RetrievalResult(out_slots, jnp.where(hit, scores, 0.0), feats)


# --------------------------------------------------------------------------
# RETRIEVE — brute force (exact; also the fallback when index not ready)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 4))
def retrieve_bruteforce(config: MemoryConfig, state: MemoryState,
                        queries: jax.Array,
                        query_locations: Optional[jax.Array] = None,
                        k: int = 5) -> RetrievalResult:
    """Exact retrieval: one [B, M] masked matmul over the whole bank (MXU)."""
    M = state.max_memories
    qn = _l2norm(queries)
    inv_norm = jax.lax.rsqrt(
        jnp.sum(state.features ** 2, axis=-1) + 1e-12)          # [M]
    cos = jnp.einsum("bd,md->bm", qn, state.features,
                     precision=jax.lax.Precision.HIGHEST) * inv_norm[None, :]

    slots = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32),
                             (queries.shape[0], M))
    combined = _combined_score(config, state, cos, slots, query_locations)
    active = jnp.arange(M) < state.active_count()
    combined = jnp.where(active[None, :], combined, NEG_INF)

    scores, out_slots = jax.lax.top_k(combined, k)   # exact reference path
    hit = scores > NEG_INF / 2
    out_slots = jnp.where(hit, out_slots.astype(jnp.int32), -1)
    feats = state.features[jnp.maximum(out_slots, 0)]
    feats = jnp.where(hit[..., None], feats, 0.0)
    return RetrievalResult(out_slots, jnp.where(hit, scores, 0.0), feats)


@functools.partial(jax.jit, static_argnums=(0, 4))
def retrieve_flat(config: MemoryConfig, state: MemoryState,
                  queries: jax.Array,
                  query_locations: Optional[jax.Array] = None,
                  k: int = 5) -> RetrievalResult:
    """Batched flat scan over the whole bank (bandwidth-optimal for large B).

    Two strategies (config.flat_strategy):

    - "scan" (default — end-to-end measured winner at B=1024, see
      docs/BENCHMARKS.md): the XLA path — [B, M] coarse scores +
      `approx_max_k` funnel.
    - "blockmax": streaming Pallas kernel that never materializes
      [B, M] — per-R-row block maxima come back from one fused scan
      pass, a hierarchical exact top-k picks the winning blocks, and
      their member rows get the exact f32 rerank. The block-max funnel
      provably contains the coarse top-k (only k-1 elements can beat the
      k-th best, so its block max ranks <= k). Falls back to the same
      math in XLA on CPU / with query locations. The coarse engine of
      the host-spilled 10M tier, where no [B, M] can exist.
    """
    if config.flat_strategy == "blockmax":
        return _retrieve_flat_blockmax(config, state, queries,
                                       query_locations, k)
    return _retrieve_flat_scan(config, state, queries, query_locations, k)


def _retrieve_flat_scan(config: MemoryConfig, state: MemoryState,
                        queries: jax.Array,
                        query_locations: Optional[jax.Array],
                        k: int) -> RetrievalResult:
    """Original flat scan: one [M, D]·[D, B] matmul, [B, M] materialized.

    Roofline: ~M·D bytes bank read per batch plus the [B, M] score
    write+reread; `approx_max_k` (recall 0.95) funnels into the exact f32
    rerank. Same coarse→exact-f32-rerank funnel as the IVF path.
    """
    M = state.max_memories
    qn = _l2norm(queries)                                        # [B, D]
    cos = _coarse_cos(state.features_nb16, qn, state.coarse_scale)
    # funnel-score dtype: bf16 halves the [B, M] intermediate traffic
    # (the exact f32 rerank restores exactness on the survivors)
    sdt = jnp.bfloat16 if config.flat_score_dtype == "bf16" else jnp.float32
    cos = cos.astype(sdt)

    # streaming [M] metadata (no scatter/gather)
    ages = (state.step - state.timestamp) * config.seconds_per_step
    temporal = jnp.exp(-jnp.maximum(ages, 0.0) / config.temporal_tau)
    if query_locations is not None:
        d = jnp.sqrt(jnp.sum(
            (state.locations[None] - query_locations[:, None]) ** 2,
            axis=-1) + 1e-12)
        spatial = (1.0 / (1.0 + d)).astype(sdt)
    else:
        spatial = jnp.zeros((), sdt)
    combined = (config.w_cosine * cos + config.w_spatial * spatial
                + (config.w_temporal * temporal).astype(sdt)[None, :]) \
        * state.strength.astype(sdt)[None, :]
    active = jnp.arange(M) < state.active_count()
    combined = jnp.where(active[None, :], combined,
                         jnp.asarray(NEG_INF, sdt))

    kk = min(max(config.rerank_candidates, 4 * k), M)
    wide = min(config.flat_wide_funnel, M)
    if wide > kk and not config.flat_exact_funnel:
        # WIDE approx funnel -> exact narrow: approx_max_k's per-element
        # drop probability for a true top-10 item scales ~(k-1)/2L with
        # L ~ wide/(2(1-recall_target)) buckets, so widening the approx
        # stage 8-16x cuts the slack ~8-16x for a few percent of cost
        # (the values come back with the indices — the exact top-kk
        # selection over [B, wide] is one cheap sort, no gathers).
        vals_w, pick_w = jax.lax.approx_max_k(
            combined, wide, recall_target=config.flat_funnel_recall)
        cand_coarse, idx = jax.lax.top_k(vals_w, kk)
        pick = jnp.take_along_axis(pick_w, idx, axis=1)
        cand_valid = pick < state.active_count()
    elif config.flat_exact_funnel:
        # EXACT coarse funnel, zero slack: the coarse top-kk rows live in
        # the top-kk blocks by block max (each top row makes its own
        # block's max rank <= kk), so expanding those blocks and exact-
        # top-k-ing their coarse scores returns the exact coarse top-kk.
        # Costs one [B, M/8] reshape-max + hierarchical exact top-k +
        # one [B, kk*8] structured gather — no approx_max_k recall
        # lottery (the measured source of the headline's ~0.35% misses;
        # runs/rescue_ab_1m.out post-mortem).
        Rb = 8
        pad = (-M) % Rb
        bmsrc = (combined if pad == 0 else
                 jnp.pad(combined, ((0, 0), (0, pad)),
                         constant_values=jnp.asarray(NEG_INF, sdt)))
        bm = bmsrc.reshape(combined.shape[0], -1, Rb).max(axis=-1)
        cand_slots, slots_valid = select_block_candidates(
            bm, kk, k, state.active_count(), M, Rb)      # [B, kk*8]
        csc = jnp.take_along_axis(bmsrc, cand_slots, axis=1)
        csc = jnp.where(slots_valid, csc, jnp.asarray(NEG_INF, sdt))
        cand_coarse, idx = jax.lax.top_k(csc, kk)        # exact
        pick = jnp.take_along_axis(cand_slots, idx, axis=1)
        cand_valid = jnp.take_along_axis(slots_valid, idx, axis=1)
    else:
        # TPU-native approximate top-k (hardware MIPS path): the exact
        # f32 rerank below absorbs the small recall slack. Exact
        # sort-based top_k over a 1M-wide row costs ~20 ms; approx_max_k
        # is ~an order cheaper.
        cand_coarse, pick = jax.lax.approx_max_k(
            combined, kk, recall_target=config.flat_funnel_recall)
        cand_valid = jnp.take_along_axis(
            jnp.broadcast_to(active[None, :], combined.shape), pick,
            axis=1)

    cand_feats = state.features[pick]                            # [B, kk, D]
    exact_cos = jnp.einsum(
        "bkd,bd->bk", _l2norm(cand_feats.astype(jnp.float32)), qn,
        precision=jax.lax.Precision.HIGHEST)
    exact = _combined_score(config, state, exact_cos, pick,
                            query_locations)
    exact = jnp.where(cand_valid, exact, NEG_INF)

    scores, pick2 = jax.lax.top_k(exact, k)
    out_slots = jnp.take_along_axis(pick, pick2, axis=1).astype(jnp.int32)
    feats = jnp.take_along_axis(cand_feats, pick2[..., None], axis=1)

    B = queries.shape[0]
    R = min(config.flat_rescue_queries, B)
    kk2 = min(config.flat_rescue_width, M)
    if R > 0 and kk2 > kk:
        scores, out_slots, feats = _flat_rescue(
            config, state, qn, combined, pick, cand_coarse,
            scores, out_slots, feats, query_locations, k, R, kk2)

    hit = scores > NEG_INF / 2
    out_slots = jnp.where(hit, out_slots, -1)
    feats = jnp.where(hit[..., None], feats, 0.0)
    return RetrievalResult(out_slots, jnp.where(hit, scores, 0.0), feats)


def _flat_rescue(config: MemoryConfig, state: MemoryState, qn: jax.Array,
                 combined: jax.Array, pick: jax.Array,
                 cand_coarse: jax.Array, scores: jax.Array,
                 out_slots: jax.Array, feats: jax.Array,
                 query_locations: Optional[jax.Array], k: int, R: int,
                 kk2: int):
    """Near-tie rescue: re-funnel the R riskiest queries kk2-wide.

    A true top-k row can only be absent from the narrow funnel when its
    quantized coarse score fell below the funnel cutoff — i.e. when the
    margin between the query's k-th EXACT score and its coarse cutoff is
    within quantization distance. Rescue = pick the R smallest-margin
    queries, draw kk2 candidates from their (already materialized) coarse
    rows, exact-rerank the UNION of narrow+wide candidates (dedup by slot,
    so the result strictly dominates the narrow pass), and scatter the
    rows back. Costs one [R, M] gather + one [R, kk+kk2, D] rerank — no
    second bank scan.
    """
    M = state.max_memories
    kk = pick.shape[1]
    # funnel cutoff from the approx_max_k VALUES (already materialized —
    # a take_along_axis over the [B, M] coarse matrix costs a large
    # random gather on TPU)
    coarse_cut = cand_coarse.min(axis=1).astype(jnp.float32)     # [B]
    margin = scores[:, k - 1] - coarse_cut
    _, risky = jax.lax.top_k(-margin, R)                         # [R]
    sub = combined[risky]                                        # [R, M]
    _, pick_w = jax.lax.approx_max_k(sub, kk2, recall_target=0.99)
    slots_all = jnp.concatenate([pick[risky], pick_w], axis=1)   # [R, C]
    C = kk + kk2
    valid_all = slots_all < state.active_count()    # == active[slots_all]
    # union semantics need dedup: a slot in both funnels gets identical
    # exact scores and would occupy two of the k output lanes
    pos = jnp.arange(C)
    is_dup = ((slots_all[:, :, None] == slots_all[:, None, :])
              & (pos[None, :, None] < pos[None, None, :])).any(axis=1)
    feats_all = state.features[slots_all]                        # [R, C, D]
    qn_r = qn[risky]
    cos_all = jnp.einsum(
        "bkd,bd->bk", _l2norm(feats_all.astype(jnp.float32)), qn_r,
        precision=jax.lax.Precision.HIGHEST)
    loc_r = None if query_locations is None else query_locations[risky]
    exact_all = _combined_score(config, state, cos_all, slots_all, loc_r)
    exact_all = jnp.where(valid_all & ~is_dup, exact_all, NEG_INF)
    s_w, p_w = jax.lax.top_k(exact_all, k)
    slots_w = jnp.take_along_axis(slots_all, p_w, axis=1).astype(jnp.int32)
    f_w = jnp.take_along_axis(feats_all, p_w[..., None], axis=1)
    return (scores.at[risky].set(s_w), out_slots.at[risky].set(slots_w),
            feats.at[risky].set(f_w))


def _flat_kernel_ok(config: MemoryConfig, state: MemoryState,
                    query_locations) -> bool:
    """The streaming kernel handles the no-spatial case (bench/serving
    path); spatial scoring needs per-query location math in the pass and
    falls back to the XLA block-max variant."""
    if query_locations is not None:
        return False
    if state.feature_dim % 128 != 0:
        return False
    try:
        from aura_snn_rag_tpu.ops.pallas.flat_scan import pallas_available
        return pallas_available()
    except ImportError:  # pragma: no cover
        return False


def select_block_candidates(bm: jax.Array, funnel_blocks: int, k: int,
                            active_count, M: int, R: int,
                            tile_m: Optional[int] = None):
    """Expand the top blocks of a block-max surface into candidate slots.

    bm: [B, n_blocks] per-block maxima of the coarse combined score
    (dead/padded blocks = NEG_INF). Returns (cand_slots [B, F],
    cand_valid [B, F]) with F = min(max(funnel_blocks, k), n_blocks)·R.

    Block→slot layout: contiguous (`blocks*R + arange(R)`, the XLA
    reshape-max paths) by default; pass `tile_m` for the Pallas kernel's
    strided-within-tile layout (`flat_scan.block_member_slots`).

    Hierarchical EXACT selection: super-block maxima (xR2) -> exact top_k
    over ~n_blocks/R2 -> expand -> exact top_k over block maxima. Both
    levels preserve the containment guarantee (a top-j block's super-max
    ranks <= j), so unlike `approx_max_k` there is NO recall slack before
    the caller's exact rerank. Shared by the flat blockmax path and the
    host-spilled bank (memory/host_spill.py).
    """
    B, n_blocks = bm.shape
    kk_b = min(max(funnel_blocks, k), n_blocks)

    # hierarchical exact select: super-blocks shrink the sort surface 16x
    R2 = 16
    if n_blocks > 4 * R2 * kk_b:
        spad = (-n_blocks) % R2
        sup = jnp.pad(bm, ((0, 0), (0, spad)), constant_values=NEG_INF) \
            .reshape(B, -1, R2).max(axis=-1)                     # [B, Nsup]
        kk_s = min(max(kk_b, 2 * k), sup.shape[1])
        _, sup_pick = jax.lax.top_k(sup, kk_s)                   # exact
        blk_ids = (sup_pick[..., None] * R2
                   + jnp.arange(R2)[None, None, :]).reshape(B, -1)
        # ids past n_blocks (padded super-block tail) clamp to the last
        # block; their value is forced to NEG_INF so the clamp can never
        # surface a real block twice with a finite score
        in_range = blk_ids < n_blocks
        blk_ids = jnp.minimum(blk_ids, n_blocks - 1)
        blk_vals = jnp.where(in_range,
                             jnp.take_along_axis(bm, blk_ids, axis=1),
                             NEG_INF)
        _, p2 = jax.lax.top_k(blk_vals, kk_b)                    # exact
        blocks = jnp.take_along_axis(blk_ids, p2, axis=1)        # [B, kk_b]
        block_live = jnp.take_along_axis(blk_vals, p2, axis=1) > NEG_INF / 2
    else:
        bvals, blocks = jax.lax.top_k(bm, kk_b)
        block_live = bvals > NEG_INF / 2

    if tile_m is None:
        member = (blocks[..., None] * R
                  + jnp.arange(R)[None, None, :])
    else:
        from aura_snn_rag_tpu.ops.pallas.flat_scan import block_member_slots
        member = block_member_slots(blocks, tile_m, R)
    cand_slots = member.reshape(B, kk_b * R)
    cand_valid = (cand_slots < active_count) \
        & jnp.repeat(block_live, R, axis=1)
    cand_slots = jnp.minimum(cand_slots, M - 1)
    return cand_slots, cand_valid


def _retrieve_flat_blockmax(config: MemoryConfig, state: MemoryState,
                            queries: jax.Array,
                            query_locations: Optional[jax.Array],
                            k: int) -> RetrievalResult:
    """Flat scan via the streaming block-max funnel (no [B, M] anywhere).

    1. Block maxima of the combined coarse score, [B, M/R] — from the
       Pallas one-pass kernel (ops/pallas/flat_scan.py) or the same math
       in XLA (CPU / spatial queries).
    2. Hierarchical EXACT selection of the top `flat_block_funnel` blocks:
       super-block maxima (xR2) -> exact top_k over ~M/(R·R2) -> expand ->
       exact top_k over block maxima. Both levels preserve the containment
       guarantee (a top-j block's super-max ranks <= j), so unlike
       `approx_max_k` there is NO recall slack before the rerank.
    3. Exact f32 rerank of the winning blocks' member rows (funnel width
       flat_block_funnel*R rows >= the old 128, with provable coarse
       containment).
    """
    from aura_snn_rag_tpu.ops.pallas.flat_scan import (
        BLOCK_R, default_interpret, flat_blockmax, pack_row_terms)

    M = state.max_memories
    qn = _l2norm(queries)                                        # [B, D]
    B = qn.shape[0]
    R = BLOCK_R
    kernel_tile_m = None          # set on the kernel path (strided blocks)

    ages = (state.step - state.timestamp) * config.seconds_per_step
    temporal = jnp.exp(-jnp.maximum(ages, 0.0) / config.temporal_tau)
    active = jnp.arange(M) < state.active_count()
    mul = jnp.where(active, config.w_cosine * state.strength, 0.0)
    add = jnp.where(active,
                    config.w_temporal * temporal * state.strength, NEG_INF)

    if _flat_kernel_ok(config, state, query_locations):
        # The kernel only selects funnel CANDIDATES (indices) — grads flow
        # through the exact rerank einsum on qn below, never through the
        # coarse scan. stop_gradient makes that explicit and keeps JAX
        # from attempting a (unsupported) JVP of the pallas_call when the
        # queries carry tangents (e.g. in-train-step retrieval).
        qsg = jax.lax.stop_gradient(qn)
        Bp = max(128, ((B + 127) // 128) * 128)
        qc, qscale = _to_coarse_rows(qsg, state.features_nb16.dtype)
        qp = jnp.pad(qc, ((0, Bp - B), (0, 0)))                  # [Bp, D]
        qs_p = jnp.pad(qscale, (0, Bp - B), constant_values=1.0)
        kernel_tile_m = config.flat_tile_m
        # per-row dequant scale folds into the kernel's per-row affine
        # term, the per-QUERY max-abs scale into its [B, 1] epilogue
        # factor: true cos = acc·row_scale·q_scale/127² — both sides now
        # use the full ±127 range (same noise fix as _coarse_cos)
        mul2d, add2d = pack_row_terms(
            jax.lax.stop_gradient(mul * state.coarse_scale),
            jax.lax.stop_gradient(add),
            M, kernel_tile_m)
        bm = flat_blockmax(state.features_nb16, qp, mul2d, add2d,
                           q_scale=jax.lax.stop_gradient(qs_p),
                           interpret=default_interpret(),
                           tile_m=kernel_tile_m)[:B]             # [B, Nblk]
    else:
        cos = _coarse_cos(state.features_nb16, qn, state.coarse_scale)
        combined = cos * mul[None, :] + add[None, :]
        if query_locations is not None:
            d = jnp.sqrt(jnp.sum(
                (state.locations[None] - query_locations[:, None]) ** 2,
                axis=-1) + 1e-12)
            spatial = (config.w_spatial / (1.0 + d)) \
                * state.strength[None, :]
            combined = combined + jnp.where(active[None, :], spatial, 0.0)
        pad = (-M) % R
        if pad:
            combined = jnp.pad(combined, ((0, 0), (0, pad)),
                               constant_values=NEG_INF)
        bm = combined.reshape(B, -1, R).max(axis=-1)             # [B, Nblk]

    cand_slots, cand_valid = select_block_candidates(
        bm, config.flat_block_funnel, k, state.active_count(), M, R,
        tile_m=kernel_tile_m)

    cand_feats = state.features[cand_slots]                  # [B, kk_b*R, D]
    exact_cos = jnp.einsum(
        "bkd,bd->bk", _l2norm(cand_feats.astype(jnp.float32)), qn,
        precision=jax.lax.Precision.HIGHEST)
    exact = _combined_score(config, state, exact_cos, cand_slots,
                            query_locations)
    exact = jnp.where(cand_valid, exact, NEG_INF)

    scores, pick2 = jax.lax.top_k(exact, k)
    out_slots = jnp.take_along_axis(cand_slots, pick2, axis=1) \
        .astype(jnp.int32)
    hit = scores > NEG_INF / 2
    out_slots = jnp.where(hit, out_slots, -1)
    feats = jnp.take_along_axis(cand_feats, pick2[..., None], axis=1)
    feats = jnp.where(hit[..., None], feats, 0.0)
    return RetrievalResult(out_slots, jnp.where(hit, scores, 0.0), feats)


def retrieve_auto(config: MemoryConfig, state: MemoryState,
                  queries: jax.Array,
                  query_locations: Optional[jax.Array] = None,
                  k: int = 5) -> RetrievalResult:
    """Traceable dispatch across the three retrieval paths.

    - Large batches (B·probe·C ≥ M): the IVF gathers would touch at least
      as much HBM as one flat pass — use the batched flat bf16 scan
      (bandwidth-optimal, ~exact).
    - Small batches: IVF when the index is live (hippocampal.py:259
      semantics: `_index_ready and memory_count > centroids_k`), else
      brute force. Both cond branches compile; one executes.
    """
    B = queries.shape[0]
    ivf_traffic = B * config.probe_centroids * config.bucket_capacity
    if ivf_traffic >= state.max_memories:
        return retrieve_flat(config, state, queries, query_locations, k)
    use_index = state.index_ready & (
        state.active_count() > jnp.asarray(state.k_centroids, jnp.int32))
    return jax.lax.cond(
        use_index,
        lambda: retrieve(config, state, queries, query_locations, k),
        lambda: retrieve_bruteforce(config, state, queries,
                                    query_locations, k),
    )


# --------------------------------------------------------------------------
# DECAY
# --------------------------------------------------------------------------

@functools.partial(jax.jit, donate_argnums=0)
def _decay(state: MemoryState, rate) -> MemoryState:
    return state._replace(
        strength=state.strength * (1.0 - rate),
        decay_accum=state.decay_accum + jnp.log(1.0 - rate))


def decay_memories(state: MemoryState, decay_rate: float = 0.01) -> MemoryState:
    """Multiplicative strength decay (hippocampal.py:334)."""
    return _decay(state, jnp.asarray(decay_rate, state.strength.dtype))


def tick(state: MemoryState, steps: float = 1.0) -> MemoryState:
    """Advance the logical clock (replaces wall-clock time.time())."""
    return state._replace(step=state.step + steps)


# --------------------------------------------------------------------------
# REBUILD — batched k-means + bucketed layout construction
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 3), donate_argnums=1)
def rebuild_centroids(config: MemoryConfig, state: MemoryState,
                      key: jax.Array,
                      unrolled_spill: bool = False) -> MemoryState:
    """Full index rebuild (hippocampal.py:345-377, vectorized).

    sample-k init → `rebuild_lloyd_iters` Lloyd iterations (assignment by one
    [M, K] matmul; means by segment_sum) → reassign all rows → rebuild the
    clustered candidate store with a sort-by-cluster permutation scatter.
    """
    M, K, C = state.max_memories, state.k_centroids, state.bucket_capacity
    feats = state.features
    active = jnp.arange(M) < state.active_count()

    # ---- init: K distinct random active rows ----
    # reserved overflow annex: the last G clusters are excluded from
    # k-means (sentinel centroids — never nearest, never probed) and hold
    # rows that still overflow after every spill round; queries score them
    # via one contiguous matmul merged into the funnel (engine.retrieve).
    G = min(config.overflow_buckets, K // 4)
    Ku = K - G
    r = jax.random.uniform(key, (M,)) + jnp.where(active, 0.0, 1e9)
    _, init_idx = jax.lax.top_k(-r, Ku)
    centroids = feats[init_idx]
    if G:
        centroids = jnp.concatenate(
            [centroids, jnp.full((G, feats.shape[1]), 1e6, feats.dtype)])

    # ---- Lloyd iterations (blockwise: avoid a full [M, K] live buffer) ----
    BLK = 65536
    n_blocks = max(1, -(-M // BLK))
    M_pad = n_blocks * BLK

    def assign_rows_topS(cents, S):
        """Per row: S nearest centroids + distance scores ([M,S] each)."""
        c2 = jnp.sum(cents ** 2, axis=-1)
        fpad = jnp.pad(feats, ((0, M_pad - M), (0, 0))) if M_pad != M else feats
        fblk = fpad.reshape(n_blocks, -1, feats.shape[1])

        def one_block(fb):
            d = c2[None, :] - 2.0 * (fb @ cents.T)              # [BLK, K] MXU
            negd, idx = jax.lax.top_k(-d, S)
            return idx.astype(jnp.int32), -negd

        idx, dist = jax.lax.map(one_block, fblk)
        return idx.reshape(M_pad, S)[:M], dist.reshape(M_pad, S)[:M]

    def assign_rows(cents):
        idx, _ = assign_rows_topS(cents, 1)
        return jnp.where(active, idx[:, 0], K)

    def lloyd(cents, _):
        a = assign_rows(cents)
        sums = jax.ops.segment_sum(
            jnp.where(active[:, None], feats, 0.0), a, num_segments=K + 1)[:K]
        counts = jax.ops.segment_sum(
            active.astype(feats.dtype), a, num_segments=K + 1)[:K]
        cents = jnp.where(counts[:, None] > 0, sums /
                          jnp.maximum(counts[:, None], 1.0), cents)
        return cents, None

    centroids, _ = jax.lax.scan(lloyd, centroids, None,
                                length=max(1, config.rebuild_lloyd_iters))

    # ---- final assignment + capacity-aware multi-round spill ----
    # k-means clusters can be heavily skewed; a cluster larger than the
    # bucket capacity C would silently truncate members. Remedy: rank each
    # cluster's members by distance to the centroid (closest first) and
    # iteratively spill overflow members (rank >= C) to their NEXT-nearest
    # centroid, cuckoo-style, for `spill_rounds` rounds — the single-round
    # second-choice scheme saturates in dense regions (r1 weak #4), while
    # each extra round shrinks residual drops geometrically. Queries probe
    # P ≫ spill_rounds centroids, so spilled members stay reachable.
    S = max(2, min(int(config.spill_rounds) + 1, Ku))
    idxS, distS = assign_rows_topS(centroids, S)

    def rank_within(a, key):
        """Rank of each row within its cluster ordered by ascending key."""
        order_d = jnp.argsort(key)                  # by distance
        order = order_d[jnp.argsort(a[order_d], stable=True)]  # (cluster, d)
        sorted_a = a[order]
        cnt = jax.ops.segment_sum(jnp.ones((M,), jnp.int32), a,
                                  num_segments=K + 1)[:K]
        start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)])
        r_sorted = (jnp.arange(M, dtype=jnp.int32)
                    - start[jnp.minimum(sorted_a, K - 1)])
        rank = jnp.zeros((M,), jnp.int32).at[order].set(r_sorted)
        return rank

    rows = jnp.arange(M)

    def spill_round(choice):
        a = jnp.where(active, idxS[rows, choice], K)
        d = distS[rows, choice]
        rank = rank_within(a, d)
        overflow = (rank >= C) & (a < K)
        return jnp.where(overflow & (choice < S - 1), choice + 1, choice)

    # One spill round costs two 1M-row argsorts; unrolling S-1 = 8 of them
    # multiplied the rebuild's HLO by ~8x and sent the cold remote compile
    # from ~3 min to ~20 (BENCH_r02 index_build_cold_s regression). The
    # default is a lax.scan (one round in the HLO, compile-time O(1) in
    # spill_rounds); shard_map callers pass unrolled_spill=True because a
    # scan carry trips shard_map's varying-axes typing when the rebuild
    # runs per-shard.
    choice = jnp.zeros((M,), jnp.int32)
    if unrolled_spill:
        for _ in range(S - 1):
            choice = spill_round(choice)
    else:
        choice, _ = jax.lax.scan(
            lambda c, _: (spill_round(c), None), choice, None, length=S - 1)
    assign = jnp.where(active, idxS[rows, choice], K)
    d1 = distS[rows, choice]                      # distance to final home
    counts = jax.ops.segment_sum(
        active.astype(feats.dtype), assign, num_segments=K + 1)[:K]

    # ---- bucketed layout: sort rows by (cluster, distance) ----
    order_d = jnp.argsort(d1)
    order = order_d[jnp.argsort(assign[order_d], stable=True)]
    sorted_assign = assign[order]
    start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts.astype(jnp.int32))])                 # [K+1]
    safe_sa = jnp.minimum(sorted_assign, K - 1)
    rank = jnp.arange(M, dtype=jnp.int32) - start[safe_sa]
    keep = (sorted_assign < K) & (rank >= 0) & (rank < C)

    # out-of-bounds rows (mode='drop') for non-kept entries
    row = jnp.where(keep, sorted_assign, K)
    col = jnp.where(keep, rank, 0)
    if G:
        # rows still overflowing after all spill rounds pack sequentially
        # into the annex clusters [Ku, K); beyond G*C capacity they drop
        # (reachable only by the flat/brute paths)
        over = (~keep) & (sorted_assign < K)
        a_idx = jnp.cumsum(over.astype(jnp.int32)) - 1
        in_annex = over & (a_idx < G * C)
        row = jnp.where(in_annex, Ku + a_idx // C, row)
        col = jnp.where(in_annex, a_idx % C, col)
    src_slot = order.astype(jnp.int32)

    cluster_slot = jnp.full((K, C), -1, jnp.int32).at[row, col].set(
        src_slot, mode="drop")
    cluster_gen = jnp.full((K, C), -1, jnp.int32).at[row, col].set(
        state.slot_gen[order], mode="drop")
    normed = _l2norm(feats[order]).astype(state.clustered.dtype)
    clustered = jnp.zeros_like(state.clustered).at[row, col].set(
        normed, mode="drop")
    cluster_ts = jnp.zeros_like(state.cluster_ts).at[row, col].set(
        state.timestamp[order], mode="drop")
    # encode current absolute strength: exp(accum - cluster_decay) == s
    s = jnp.maximum(state.strength[order], 1e-20)
    cluster_decay = jnp.zeros_like(state.cluster_decay).at[row, col].set(
        state.decay_accum - jnp.log(s), mode="drop")
    cluster_loc = jnp.zeros_like(state.cluster_loc).at[row, col].set(
        state.locations[order], mode="drop")
    bucket_fill = jnp.minimum(counts.astype(jnp.int32), C)
    if G:
        n_over = jnp.minimum(jnp.sum(over.astype(jnp.int32)), G * C)
        annex_fill = jnp.clip(n_over - jnp.arange(G) * C, 0, C)
        bucket_fill = bucket_fill.at[Ku:].set(annex_fill)

    return state._replace(
        centroid_id=jnp.where(active, assign, -1).astype(jnp.int32),
        centroids=centroids,
        centroid_counts=counts,
        clustered=clustered,
        cluster_slot=cluster_slot,
        cluster_gen=cluster_gen,
        cluster_ts=cluster_ts,
        cluster_decay=cluster_decay,
        cluster_loc=cluster_loc,
        bucket_fill=bucket_fill,
        index_ready=state.active_count() >= jnp.asarray(Ku, jnp.int32),
    )
