"""Streaming flat-scan kernel: one-pass bank scoring with a block-max funnel.

The XLA flat path (`engine.retrieve_flat`, reference math:
/root/reference/src/core/hippocampal.py:245-319 on the brute-force branch)
materializes the [B, M] coarse score matrix to HBM (written by the scoring
matmul, re-read by `approx_max_k`) — at 1M x 768 that is ~0.5 GB of extra
HBM traffic per 128-query batch on top of the bank read, and the measured
effective bandwidth tops out at ~290 of ~820 GB/s.

This kernel never materializes [B, M]. It streams the coarse bank
(int8 or bf16) tile by tile through the Pallas pipeline (auto
double-buffered HBM->VMEM), scores each tile on the MXU, applies the
per-row affine metadata terms, and reduces each R-row block to its maximum
before writing — the output is [M/R, B], an R x smaller funnel surface.

Why a block-max funnel is safe: only k-1 elements can out-score the k-th
best, so the k-th best element's block maximum is beaten by at most k-1
other block maxima — the top-`kk_b >= k` blocks by maximum PROVABLY contain
every top-k element (by coarse score). The caller expands the winning
blocks to their R member rows and exact-f32-reranks them (wider cushion
than the old 128-row approx_max_k funnel, with no approx recall slack).

There is deliberately no in-kernel top-k: per-tile candidate extraction
loops (the v2/v3 IVF pattern) cost O(k) serial passes over each tile and
would dominate the 1-2 us/tile budget here. The block-max reduce is one
cheap VPU pass fused behind the matmul, and the real selection runs once
in XLA over the Rx-smaller maxima surface.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aura_snn_rag_tpu.ops.pallas.ivf_scan import (  # noqa: F401
    default_interpret, pallas_available)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS = True
except ImportError:  # pragma: no cover
    _PALLAS = False

NEG_INF = -1e30

# rows per funnel block (the kernel's reduce unit). 8 keeps the per-block
# expansion cheap in the rerank while shrinking the selection surface 8x.
BLOCK_R = 8
# bank rows per grid step: balances VMEM (int8 tile = TILE_M*768 bytes,
# double-buffered by the pipeline) against grid overhead. Must be a
# multiple of 32 (int8 sublane tile) and of BLOCK_R.
TILE_M = 1024


def _kernel(bank_ref, qT_ref, mul_ref, add_ref, out_ref, *, total_rows,
            tile_m, block_r, inv_scale, int8_via_bf16):
    """One grid step: score a [tile_m, D] bank tile against all queries,
    apply per-row affine metadata, reduce to [tile_m/block_r, B] maxima."""
    i = pl.program_id(0)
    if inv_scale is not None and int8_via_bf16:
        # int8 storage, bf16 MXU compute: Mosaic's native s8xs8->s32 dot
        # measures ~5x below the bf16 MXU rate on v5e, and the math stays
        # EXACT through the cast — +-127 is exactly representable in bf16,
        # every product <= 127^2 = 16129 is an exactly-representable
        # integer, and the f32 accumulator is exact for integer sums up to
        # 2^24 (worst case here: 768 * 16129 ~= 1.24e7 < 1.67e7). So the
        # bank read stays 1 byte/row-element while the matmul rides the
        # fast MXU path.
        acc = jax.lax.dot_general(
            bank_ref[...].astype(jnp.bfloat16),
            qT_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [tile_m, B]
    else:
        acc = jax.lax.dot_general(
            bank_ref[...], qT_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32 if inv_scale is None
            else jnp.int32)                               # [tile_m, B]
    if inv_scale is not None:                             # int8 bank
        cos = acc.astype(jnp.float32) * inv_scale
    else:                                                 # bf16 bank
        cos = acc
    # combined = w_c*strength*cos + (w_t*temporal*strength) per row, with
    # inactive rows already carrying add = NEG_INF from the caller
    combined = cos * mul_ref[...] + add_ref[...]
    # mask the padded tail of the final tile (M need not divide tile_m)
    row = i * tile_m + jax.lax.broadcasted_iota(
        jnp.int32, (tile_m, 1), 0)
    combined = jnp.where(row < total_rows, combined, NEG_INF)
    out_ref[...] = jnp.max(
        combined.reshape(tile_m // block_r, block_r, combined.shape[-1]),
        axis=1)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_m", "block_r",
                                    "int8_via_bf16"))
def flat_blockmax(bank_coarse: jax.Array, qT: jax.Array, mul: jax.Array,
                  add: jax.Array, interpret: bool = False,
                  tile_m: int = TILE_M, block_r: int = BLOCK_R,
                  int8_via_bf16: bool = True) -> jax.Array:
    """Per-block maxima of the combined coarse score over the whole bank.

    bank_coarse: [M, D] int8 (127-scaled) or bf16 L2-normalized rows.
    qT:          [D, B] queries, pre-transposed, dtype matching the bank
                 (int8 queries for an int8 bank). B must be a multiple
                 of 128 (pad + slice at the caller).
    mul, add:    [M, 1] f32 per-row affine metadata terms:
                 combined = mul * cos + add  (add = -inf for dead rows).
                 The int8 accumulator's 1/127^2 dequantization is applied
                 IN-KERNEL — pass `mul` in cosine units for both dtypes.

    Returns [ceil(M/tile_m) * tile_m / block_r, B] f32 block maxima
    (padded tail blocks = -inf).
    """
    M, D = bank_coarse.shape
    B = qT.shape[1]
    n_tiles = pl.cdiv(M, tile_m)
    n_blocks = n_tiles * (tile_m // block_r)
    is_int8 = bank_coarse.dtype == jnp.int8
    kernel = functools.partial(
        _kernel, total_rows=M, tile_m=tile_m, block_r=block_r,
        inv_scale=(1.0 / (127.0 * 127.0)) if is_int8 else None,
        int8_via_bf16=int8_via_bf16)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_m, D), lambda i: (i, 0)),      # bank tile
            pl.BlockSpec((D, B), lambda i: (0, 0)),           # queries
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0)),      # mul
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0)),      # add
        ],
        out_specs=pl.BlockSpec((tile_m // block_r, B), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks, B), jnp.float32),
        interpret=interpret,
    )(bank_coarse, qT, mul, add)
