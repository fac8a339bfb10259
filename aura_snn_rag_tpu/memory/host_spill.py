"""Host-spilled episodic bank: capacity beyond one chip's HBM.

The reference's acknowledged scaling ceiling is its O(n^2) cognitive map and
a 100k-row GPU-resident bank (/root/reference/README.md:39, TODO.md:12,
src/core/hippocampal.py:47). This module scales the episodic store to
O(100M) rows on one chip by splitting the bank across the memory hierarchy:

- DEVICE (HBM): int8 coarse rows ``[M, D]`` (127-scaled, L2-normalized) plus
  per-row scoring metadata (strength, timestamp). 10M x 768 int8 = 7.2 GiB —
  fits a v5e's 16 GiB; the one-pass ``flat_blockmax`` Pallas kernel scans it
  at HBM speed with no ``[B, M]`` materialization.
- HOST (RAM): exact f32 rows ``[M, D]`` (+ locations). 10M x 768 f32 =
  28.6 GiB — host RAM, never uploaded after ingest.

A query is a two-phase funnel:

1. device coarse scan (``flat_blockmax`` -> ``select_block_candidates``,
   the provable-containment block funnel) -> ``[B, F]`` signed candidate
   slot ids (-1 = dead lane) — the only device->host traffic;
2. host gathers ONLY the funnel rows (F = funnel_blocks*8 per query, block-
   contiguous so the gather is sequential) and runs the exact f32 rerank
   (cosine at full precision + spatial/temporal terms) in numpy, with the
   strength/temporal terms recomputed from host-side mirrors of the
   metadata (bit-exact: every mutation is host-initiated and applies the
   same f32 ops to both copies).

This deliberately inverts the naive "clusters on host RAM, DMA probed
blocks to device" layout: with the coarse bank resident in HBM, steady-state
interconnect traffic is ``[B, F]`` slot ids downstream and nothing upstream —
the 30 GB exact store never crosses the host<->device link. (If M outgrows
HBM even at int8, the same funnel math applies with a bucketed coarse store
streamed per-probe; see docs/SCALING.md.)

``retrieve_stream`` pipelines query batches: JAX dispatch is async, so all
device funnels are in flight before the first host rerank runs — TPU scan
overlaps host gather with no explicit threads.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.config import MemoryConfig
from aura_snn_rag_tpu.memory.engine import (
    NEG_INF, RetrievalResult, _to_coarse_rows, select_block_candidates)


def _load_rerank_native():
    """ctypes handle to the fused native rerank (native/spill_rerank.cpp),
    or None — the numpy path below is the reference implementation."""
    import ctypes

    from aura_snn_rag_tpu._native import load
    lib = load()
    if lib is None:
        return None
    try:
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.aura_spill_rerank.argtypes = [
            f32p, f32p, f32p, f32p,                       # bank mirrors
            ctypes.POINTER(ctypes.c_int32), f32p,         # slots, queries
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float,               # scalars
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,                               # B, F, D, k
            ctypes.POINTER(ctypes.c_int64), f32p]         # outputs
        return lib
    except (OSError, AttributeError):
        return None


_RERANK_NATIVE = _load_rerank_native()


class SpillDeviceState(NamedTuple):
    """Device-resident half of the spilled bank (coarse rows + metadata)."""

    coarse: jax.Array     # [M, D] int8 (per-row max-abs scaled) or bf16,
                          #   L2-normalized rows
    scale: jax.Array      # [M] f32 per-row dequant scale (int8: row max-abs,
                          #   true cos = acc*scale/127^2; bf16: 1.0)
    strength: jax.Array   # [M] f32 decayable strength
    timestamp: jax.Array  # [M] f32 logical write step

    @property
    def max_memories(self) -> int:
        return self.coarse.shape[0]


def _init_device(M: int, D: int, coarse_dtype) -> SpillDeviceState:
    return SpillDeviceState(
        coarse=jnp.zeros((M, D), coarse_dtype),
        scale=jnp.ones((M,), jnp.float32),
        strength=jnp.zeros((M,), jnp.float32),
        timestamp=jnp.zeros((M,), jnp.float32),
    )


@functools.partial(jax.jit, donate_argnums=0)
def _device_write_slice(dev: SpillDeviceState, start: jax.Array,
                        rows: jax.Array, scales: jax.Array,
                        step: jax.Array) -> SpillDeviceState:
    """Contiguous-range write via dynamic_update_slice (donated, in-place).

    Quantization happens host-side (`_host_coarse`) so a bulk ingest
    uploads int8 — 4x less interconnect traffic than shipping f32 and
    quantizing on device. The FIFO ring's writes are always (at most two)
    contiguous slot ranges, and a [B, D] dynamic_update_slice lowers to a
    plain in-place block copy — unlike a general row scatter
    (`.at[slots].set`), which TPU executes row-at-a-time."""
    B = rows.shape[0]
    return dev._replace(
        coarse=jax.lax.dynamic_update_slice(
            dev.coarse, rows, (start, jnp.int32(0))),
        scale=jax.lax.dynamic_update_slice(
            dev.scale, scales.astype(jnp.float32), (start,)),
        strength=jax.lax.dynamic_update_slice(
            dev.strength, jnp.ones((B,), jnp.float32), (start,)),
        timestamp=jax.lax.dynamic_update_slice(
            dev.timestamp, jnp.full((B,), step, jnp.float32), (start,)),
    )


def _host_coarse(feats: np.ndarray, dtype):
    """numpy mirror of engine._to_coarse_rows on L2-normalized rows:
    per-row max-abs int8 quantization -> (rows, scales [B] f32)."""
    qn = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
    if dtype == jnp.int8:
        s = np.maximum(np.max(np.abs(qn), axis=1, keepdims=True), 1e-12)
        q = np.clip(np.round(qn * (127.0 / s)), -127, 127).astype(np.int8)
        return q, s[:, 0].astype(np.float32)
    # bf16 via jnp (numpy lacks bf16)
    return (jnp.asarray(qn).astype(dtype),
            np.ones(qn.shape[0], np.float32))


@functools.partial(jax.jit, donate_argnums=0)
def _device_decay(dev: SpillDeviceState, rate: jax.Array) -> SpillDeviceState:
    return dev._replace(strength=dev.strength * (1.0 - rate))


@functools.partial(jax.jit,
                   static_argnames=("funnel_blocks", "k", "w_cosine",
                                    "w_temporal", "temporal_tau",
                                    "seconds_per_step", "use_kernel",
                                    "row_funnel", "query_chunk"))
def _device_funnel(dev: SpillDeviceState, q: jax.Array,
                   q_scale: jax.Array,
                   active_count: jax.Array, step: jax.Array, *,
                   funnel_blocks: int, k: int, w_cosine: float,
                   w_temporal: float, temporal_tau: float,
                   seconds_per_step: float, use_kernel: bool,
                   row_funnel: int = 0, query_chunk: int = 256):
    """Phase 1 on device: coarse scan -> funnel candidate slots + metadata.

    q: [Bp, D] coarse-dtype queries, Bp a multiple of 128 (kernel path) —
    the caller slices the true B back out. q_scale: [Bp] f32 per-query
    max-abs dequant scales (1.0 on the bf16 path) — the query-side noise
    fix matching the bank rows' per-row scale (engine._to_coarse_rows).
    Returns cand_slots [Bp, F] i32 with -1 marking dead/invalid
    candidates — the ONLY downstream traffic (the host mirrors
    strength/timestamp, so the exact rerank's metadata terms come from
    host RAM instead of two extra device gathers + 2/3 more
    device->host bytes; at 10M the 786 KB 3-array funnel cost ~103 ms
    of the measured ~7.6 MB/s tunnel downlink per 128-query batch).

    row_funnel (config.spill_funnel_rows): when 0 < row_funnel < F, a
    second device stage gathers the F block-funnel candidates' coarse rows
    ([Bp, F, D] int8, HBM-speed) and keeps only the top-row_funnel by
    exact-coarse combined score — shrinking BOTH the transfer and the host
    f32 rerank by F/row_funnel at the cost of one cheap device gather.

    query_chunk (config.spill_query_chunk): queries run through the scan
    in chunks of this size (lax.map). The block-max surface is
    [chunk, M/R] f32 — at B=1024 x 10M rows the unchunked surface was
    4.77 GB PLUS a same-size relayout copy feeding the block top-k, a
    compile-time HBM OOM next to the 7.2 GB coarse bank (the round-4
    B=1024 failure). Chunking bounds the temp at chunk·M/R·4 bytes
    (1.2 GB at 256 x 10M) for n_chunks sequential bank reads; the scan is
    ~10 ms of the ~1 s 10M funnel budget, so the extra reads are noise
    next to the transfer+rerank the big batch amortizes.
    """
    from aura_snn_rag_tpu.ops.pallas.flat_scan import (
        BLOCK_R, TILE_M, default_interpret, flat_blockmax, pack_row_terms)

    M = dev.max_memories
    R = BLOCK_R
    Bp = q.shape[0]
    ages = (step - dev.timestamp) * seconds_per_step
    temporal = jnp.exp(-jnp.maximum(ages, 0.0) / temporal_tau)
    active = jnp.arange(M) < active_count
    # per-row dequant scale folds into the cos multiplier: the kernel and
    # the fallback both compute cos = acc/127^2, true cos = acc*scale/127^2
    mul = jnp.where(active, w_cosine * dev.strength * dev.scale, 0.0)
    add = jnp.where(active, w_temporal * temporal * dev.strength, NEG_INF)

    kernel_tile_m = TILE_M if use_kernel else None
    mul2d = add2d = None
    if use_kernel:
        mul2d, add2d = pack_row_terms(mul, add, M, kernel_tile_m)

    def funnel_chunk(args) -> jax.Array:
        qc, qs = args                     # [C, D] coarse queries, [C] f32
        if use_kernel:
            bm = flat_blockmax(dev.coarse, qc, mul2d, add2d, q_scale=qs,
                               interpret=default_interpret())  # [C, Nblk]
        else:  # XLA fallback (CPU tests): same math, [C, M] materialized
            if dev.coarse.dtype == jnp.int8:
                acc = jnp.einsum("md,bd->bm", dev.coarse, qc,
                                 preferred_element_type=jnp.int32)
                cos = acc.astype(jnp.float32) \
                    * (qs[:, None] * (1.0 / (127.0 * 127.0)))
            else:
                cos = jnp.einsum("md,bd->bm", dev.coarse,
                                 qc).astype(jnp.float32)
            combined = cos * mul[None, :] + add[None, :]
            pad = (-M) % R
            if pad:
                combined = jnp.pad(combined, ((0, 0), (0, pad)),
                                   constant_values=NEG_INF)
            bm = combined.reshape(combined.shape[0], -1, R).max(axis=-1)

        cand_slots, cand_valid = select_block_candidates(
            bm, funnel_blocks, k, active_count, M, R, tile_m=kernel_tile_m)
        F = cand_slots.shape[1]
        if not (0 < row_funnel < F):
            return jnp.where(cand_valid, cand_slots, -1).astype(jnp.int32)

        # second stage: exact-coarse rescore of the F candidates, keep
        # only the top rows
        safe = jnp.where(cand_valid, cand_slots, 0)
        rows = dev.coarse[safe]                              # [C, F, D]
        if dev.coarse.dtype == jnp.int8:
            acc = jnp.einsum("bfd,bd->bf", rows, qc,
                             preferred_element_type=jnp.int32)
            cos = acc.astype(jnp.float32) \
                * (qs[:, None] * (1.0 / (127.0 * 127.0)))
        else:
            cos = jnp.einsum("bfd,bd->bf", rows, qc).astype(jnp.float32)
        score = cos * mul[safe] + add[safe]
        score = jnp.where(cand_valid, score, NEG_INF)
        top_s, top_i = jax.lax.top_k(score, row_funnel)
        out = jnp.take_along_axis(safe, top_i, axis=1)
        return jnp.where(top_s > NEG_INF / 2, out, -1).astype(jnp.int32)

    if 0 < query_chunk < Bp and Bp % query_chunk == 0:
        n = Bp // query_chunk
        chunks = (q.reshape(n, query_chunk, q.shape[1]),
                  q_scale.reshape(n, query_chunk))
        return jax.lax.map(funnel_chunk, chunks).reshape(Bp, -1)
    return funnel_chunk((q, q_scale))


class SpilledBank:
    """Host orchestrator for the spilled bank (mutable at the API edge,
    like `hippocampus.HippocampalFormation` — all device math is jitted
    pure functions on the `SpillDeviceState` pytree)."""

    def __init__(self, config: MemoryConfig, device=None):
        self.config = config
        M, D = config.max_memories, config.feature_dim
        coarse_dtype = (jnp.int8 if config.coarse_dtype == "int8"
                        else jnp.bfloat16)
        self.dev = _init_device(M, D, coarse_dtype)
        if device is not None:
            self.dev = jax.device_put(self.dev, device)
        # host half: exact rows + locations (plain RAM, no device copy).
        # Inverse row norms are precomputed at write time so the exact
        # rerank is one raw-row einsum + scale (no per-query normalize
        # pass over the [B, F, D] gather).
        self.host_features = np.zeros((M, D), np.float32)
        self.host_inv_norm = np.zeros((M,), np.float32)
        self.host_locations = np.zeros((M, config.spatial_dims), np.float32)
        # strength/timestamp mirrors: every mutation (write/decay) is
        # host-initiated, so the host can track them exactly — the device
        # funnel then returns ONLY slot ids and the rerank's metadata
        # terms are computed from RAM (no device gathers, 1/3 the
        # device->host transfer).
        self.host_strength = np.zeros((M,), np.float32)
        self.host_timestamp = np.zeros((M,), np.float32)
        self.count = 0          # total writes ever (ring cursor = count % M)
        self.step = 0.0         # logical clock

    # -- writes ------------------------------------------------------------

    def _host_write(self, features: np.ndarray,
                    locations: Optional[np.ndarray]):
        """Host half of a write: mirrors + quantization. Returns
        (int8/bf16 rows, slots, ring start) for `_device_write`."""
        feats = np.ascontiguousarray(features, np.float32)
        B = feats.shape[0]
        M = self.config.max_memories
        slots = (self.count + np.arange(B)) % M
        # a batch larger than the bank: only the last M rows survive
        if B > M:
            feats, slots = feats[-M:], slots[-M:]
            if locations is not None:
                locations = locations[-M:]
            B = M
        self.host_features[slots] = feats
        self.host_inv_norm[slots] = 1.0 / (
            np.linalg.norm(feats, axis=1) + 1e-12)
        if locations is not None:
            self.host_locations[slots] = np.asarray(locations, np.float32)
        else:
            self.host_locations[slots] = 0.0
        self.host_strength[slots] = 1.0
        self.host_timestamp[slots] = self.step
        rows, scales = _host_coarse(feats, self.dev.coarse.dtype)
        start = int(self.count % M)
        self.count += B
        return (rows, scales), slots, start

    def _device_write(self, rows_scales, start: int) -> None:
        """Device half: upload + ring write (at most two contiguous
        segments via dynamic_update_slice — block copies, not row
        scatters). Safe to run on a worker thread: it only touches
        `self.dev` and JAX dispatch releases the GIL during transfers."""
        rows, scales = rows_scales
        B = rows.shape[0]
        M = self.config.max_memories
        first = min(B, M - start)
        step = jnp.float32(self.step)
        self.dev = _device_write_slice(
            self.dev, jnp.int32(start), jnp.asarray(rows[:first]),
            jnp.asarray(scales[:first]), step)
        if first < B:
            self.dev = _device_write_slice(
                self.dev, jnp.int32(0), jnp.asarray(rows[first:]),
                jnp.asarray(scales[first:]), step)

    def write(self, features: np.ndarray,
              locations: Optional[np.ndarray] = None) -> np.ndarray:
        """FIFO batch write (reference one-shot semantics,
        hippocampal.py:195-243). Returns the bank slots written."""
        rows, slots, start = self._host_write(features, locations)
        self._device_write(rows, start)
        return slots

    def bulk_load_chunked(self, make_chunk, n_rows: int,
                          chunk: int = 262_144) -> None:
        """Ingest n_rows via a callable chunk factory (avoids ever holding
        the full f32 bank twice on host).

        Double-buffered: chunk i's device upload runs on a worker thread
        (the host->device copy is tunnel-I/O-bound and GIL-free) while the
        main thread generates + quantizes + host-mirrors chunk i+1 — the
        two halves of the 10M ingest that used to serialize (VERDICT r3
        #5). Ordering is preserved by the single worker."""
        from concurrent.futures import ThreadPoolExecutor

        done = 0
        pending = None
        with ThreadPoolExecutor(max_workers=1) as ex:
            while done < n_rows:
                b = min(chunk, n_rows - done)
                feats = make_chunk(done, b)
                rows, _, start = self._host_write(feats, None)
                if pending is not None:
                    pending.result()     # double-buffer: at most 1 in flight
                pending = ex.submit(self._device_write, rows, start)
                done += b
            if pending is not None:
                pending.result()

    # -- maintenance --------------------------------------------------------

    def decay(self, rate: float = 0.01) -> None:
        self.dev = _device_decay(self.dev, jnp.float32(rate))
        self.host_strength *= np.float32(1.0 - rate)

    def tick(self, steps: float = 1.0) -> None:
        self.step += steps

    @property
    def active_count(self) -> int:
        return min(self.count, self.config.max_memories)

    # -- retrieval -----------------------------------------------------------

    def _prep_queries(self, queries: np.ndarray):
        q = np.asarray(queries, np.float32)
        qn = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
        B = qn.shape[0]
        use_kernel = self._kernel_ok()
        Bp = max(128, -(-B // 128) * 128) if use_kernel else B
        # chunked funnel: Bp must divide evenly into query chunks
        qc_chunk = self.config.spill_query_chunk
        if 0 < qc_chunk < Bp:
            Bp = -(-Bp // qc_chunk) * qc_chunk
        qc, qs = _to_coarse_rows(jnp.asarray(qn), self.dev.coarse.dtype)
        qc, qs = np.asarray(qc), np.asarray(qs)
        qp = np.zeros((Bp, qc.shape[1]), qc.dtype)
        qp[:B] = qc
        qsp = np.ones((Bp,), np.float32)
        qsp[:B] = qs
        return qn, jnp.asarray(qp), jnp.asarray(qsp), B, use_kernel

    def _kernel_ok(self) -> bool:
        if self.config.feature_dim % 128 != 0:
            return False
        from aura_snn_rag_tpu.ops.pallas.flat_scan import pallas_available
        return pallas_available()

    def _dispatch_funnel(self, queries: np.ndarray):
        qn, qp, qsp, B, use_kernel = self._prep_queries(queries)
        cfg = self.config
        out = _device_funnel(
            self.dev, qp, qsp, jnp.int32(self.active_count),
            jnp.float32(self.step),
            funnel_blocks=cfg.flat_block_funnel, k=cfg.retrieve_k,
            w_cosine=cfg.w_cosine, w_temporal=cfg.w_temporal,
            temporal_tau=cfg.temporal_tau,
            seconds_per_step=cfg.seconds_per_step, use_kernel=use_kernel,
            row_funnel=cfg.spill_funnel_rows,
            query_chunk=cfg.spill_query_chunk)
        return qn, B, out

    def _host_rerank(self, qn: np.ndarray, B: int, funnel, k: int,
                     query_locations: Optional[np.ndarray],
                     use_native: bool = True):
        slots_signed = np.asarray(funnel)[:B]            # [B, F], -1 = dead
        cfg = self.config
        if (use_native and _RERANK_NATIVE is not None
                and query_locations is None):
            return self._host_rerank_native(qn, slots_signed, k)
        live = slots_signed >= 0
        cand_slots = np.maximum(slots_signed, 0)
        # metadata terms from the host mirrors (bit-exact with the device
        # arrays: writes/decay apply the same f32 ops to both)
        strength_c = self.host_strength[cand_slots]
        ages = (np.float32(self.step) - self.host_timestamp[cand_slots]) \
            * np.float32(cfg.seconds_per_step)
        temporal = np.exp(-np.maximum(ages, 0.0) / np.float32(cfg.temporal_tau))
        add_c = np.where(live,
                         np.float32(cfg.w_temporal) * temporal * strength_c,
                         np.float32(NEG_INF)).astype(np.float32)
        rows = self.host_features[cand_slots]            # [B, F, D] gather
        # batched matvec via BLAS (np.matmul dispatches to gemm; einsum
        # would run C loops — 3-4x slower on the 1-core host)
        cos = np.matmul(rows, qn.astype(np.float32)[:, :, None]) \
            .squeeze(-1) * self.host_inv_norm[cand_slots]
        score = cfg.w_cosine * strength_c * cos + add_c
        if query_locations is not None:
            d = np.sqrt(np.sum(
                (self.host_locations[cand_slots]
                 - np.asarray(query_locations, np.float32)[:, None]) ** 2,
                axis=-1) + 1e-12)
            score = score + np.where(
                add_c > NEG_INF / 2,
                cfg.w_spatial / (1.0 + d) * strength_c, 0.0)
        # exact top-k over the funnel (argpartition + order)
        kk = min(k, score.shape[1])
        part = np.argpartition(-score, kk - 1, axis=1)[:, :kk]
        vals = np.take_along_axis(score, part, axis=1)
        order = np.argsort(-vals, axis=1)
        pick = np.take_along_axis(part, order, axis=1)
        scores = np.take_along_axis(score, pick, axis=1)
        slots = np.take_along_axis(cand_slots, pick, axis=1).astype(np.int64)
        hit = scores > NEG_INF / 2
        slots = np.where(hit, slots, -1)
        feats = np.where(hit[..., None],
                         self.host_features[np.maximum(slots, 0)], 0.0)
        return RetrievalResult(slots, np.where(hit, scores, 0.0), feats)

    def _host_rerank_native(self, qn: np.ndarray, slots_signed: np.ndarray,
                            k: int) -> RetrievalResult:
        """Fused gather+score+top-k in C++ (native/spill_rerank.cpp): each
        candidate row streams once into a dot-product accumulator instead
        of materializing the [B, F, D] gather (604 MB at B=1024/F=192)
        and re-reading it through BLAS. Same math as the numpy path
        (parity-tested); spatial queries fall back to numpy."""
        import ctypes

        cfg = self.config
        B, F = slots_signed.shape
        kk = min(k, F)
        qn32 = np.ascontiguousarray(qn, np.float32)
        slots_c = np.ascontiguousarray(slots_signed, np.int32)
        out_slots = np.empty((B, kk), np.int64)
        out_scores = np.empty((B, kk), np.float32)
        f32p = ctypes.POINTER(ctypes.c_float)
        _RERANK_NATIVE.aura_spill_rerank(
            self.host_features.ctypes.data_as(f32p),
            self.host_inv_norm.ctypes.data_as(f32p),
            self.host_strength.ctypes.data_as(f32p),
            self.host_timestamp.ctypes.data_as(f32p),
            slots_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            qn32.ctypes.data_as(f32p),
            ctypes.c_float(self.step),
            ctypes.c_float(cfg.seconds_per_step),
            ctypes.c_float(cfg.temporal_tau),
            ctypes.c_float(cfg.w_cosine), ctypes.c_float(cfg.w_temporal),
            B, F, cfg.feature_dim, kk,
            out_slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out_scores.ctypes.data_as(f32p))
        hit = out_slots >= 0
        feats = np.where(hit[..., None],
                         self.host_features[np.maximum(out_slots, 0)], 0.0)
        return RetrievalResult(out_slots, out_scores, feats)

    def retrieve(self, queries: np.ndarray, k: Optional[int] = None,
                 query_locations: Optional[np.ndarray] = None
                 ) -> RetrievalResult:
        k = k or self.config.retrieve_k
        qn, B, funnel = self._dispatch_funnel(queries)
        return self._host_rerank(qn, B, funnel, k, query_locations)

    def retrieve_stream(self, query_batches: Sequence[np.ndarray],
                        k: Optional[int] = None,
                        coalesce: int = 1024) -> List[RetrievalResult]:
        """Pipelined batch retrieval: all device funnels dispatched before
        the first host rerank (async JAX dispatch = free overlap).

        Consecutive batches are COALESCED into funnel dispatches of up to
        `coalesce` queries: the device funnel is a full coarse-bank read
        (7.3 GB at 10M rows int8), so the dispatch batch amortizes it —
        the same serving-batch lever that took the device-resident flat
        scan 26k -> 56k QPS (B=128 -> 1024). Per-query funnels are
        independent, so packing/splitting is exact. Results come back in
        the caller's batch structure.

        Three-deep overlap: (1) all device funnels are dispatched up front
        (async JAX dispatch), (2) a prefetch thread pulls pack i+1's slot
        ids over the tunnel (np.asarray releases the GIL during the PJRT
        copy) while (3) the main thread runs pack i's host rerank (BLAS,
        also GIL-free) — so device scan, device->host transfer and host
        rerank all run concurrently even on a 1-core host."""
        from concurrent.futures import ThreadPoolExecutor

        k = k or self.config.retrieve_k
        sizes = [np.asarray(q).shape[0] for q in query_batches]
        packs: List[List[int]] = [[]]          # indices into query_batches
        acc = 0
        for i, s in enumerate(sizes):
            if packs[-1] and acc + s > coalesce:
                packs.append([])
                acc = 0
            packs[-1].append(i)
            acc += s
        inflight = [self._dispatch_funnel(
            np.concatenate([np.asarray(query_batches[i], np.float32)
                            for i in pack], axis=0)) for pack in packs]
        out: List[RetrievalResult] = [None] * len(query_batches)  # type: ignore
        with ThreadPoolExecutor(max_workers=1) as ex:
            pulls = [ex.submit(np.asarray, f) for (_, _, f) in inflight]
            for pack, (qn, B, _), pull in zip(packs, inflight, pulls):
                res = self._host_rerank(qn, B, pull.result(), k, None)
                off = 0
                for i in pack:
                    s = sizes[i]
                    out[i] = RetrievalResult(res.indices[off:off + s],
                                             res.scores[off:off + s],
                                             res.features[off:off + s])
                    off += s
        return out
