"""Streaming flat-scan kernel: one-pass bank scoring with a block-max funnel.

The XLA flat path (`engine.retrieve_flat`, reference math:
/root/reference/src/core/hippocampal.py:245-319 on the brute-force branch)
materializes the [B, M] coarse score matrix to HBM (written by the scoring
matmul, re-read by `approx_max_k`) — at 1M x 768 that is ~0.5 GB of extra
HBM traffic per 128-query batch on top of the bank read.

This kernel never materializes [B, M]. It streams the coarse bank
(int8 or bf16) tile by tile through the Pallas pipeline (auto
double-buffered HBM->VMEM), scores each tile on the MXU, applies the
per-row affine metadata terms, and reduces each R-row block to its maximum
before writing — the output is [B, M/R], an R x smaller funnel surface.

Layout notes (v2 of this kernel — the first version cost 2 x 4.8 GB of HLO
temps at 10M rows and ~1 GB of copy traffic per 1M-row call):

- The score tile is [B, tile_m] (queries on sublanes, bank rows on lanes),
  from the MXU-natural NT dot q[B, D] . bank[tile_m, D]^T — no operand
  transposes anywhere.
- The per-row affine terms ride as [n_tiles, tile_m] f32 (one row vector
  per grid step). The original [M, 1] shape was lane-padded 128 x by the
  TPU tiled layout: XLA inserted a 4.8-GB relayout copy PER OPERAND at
  10M rows (the host-spill OOM) and ~0.5 GB at 1M.
- The R-row block maximum is computed as R elementwise maxes of
  128-aligned lane slices — no in-kernel reshape/relayout. Blocks are
  therefore STRIDED within a tile: block g holds rows
  (g//L)*tile_m + (g%L) + L*arange(R), L = tile_m//R
  (`block_member_slots`). Any partition into R-row blocks preserves the
  funnel guarantee, so the stride is free.

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
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    _PALLAS = True
except ImportError:  # pragma: no cover
    _PALLAS = False

NEG_INF = -1e30

# rows per funnel block (the kernel's reduce unit). 8 keeps the per-block
# expansion cheap in the rerank while shrinking the selection surface 8x.
BLOCK_R = 8
# bank rows per grid step: balances VMEM (int8 tile = TILE_M*768 bytes,
# double-buffered by the pipeline) against grid overhead. Must be a
# multiple of BLOCK_R*128 so the lane-slice block reduce stays 128-aligned.
TILE_M = 1024


def pack_row_terms(mul: jax.Array, add: jax.Array, M: int,
                   tile_m: int = TILE_M):
    """Tile the per-row affine terms for the kernel: [M] -> [n_tiles8,
    tile_m] f32 (compact TPU layout; a [M, 1] operand would be lane-padded
    128x). n_tiles8 rounds the tile count up to a multiple of 8 because
    the kernel reads the terms through an (8, tile_m) block (Mosaic
    requires the sublane block dim divisible by 8) and dynamically slices
    its own row. Tail rows pad with mul=0 / add=NEG_INF so they can never
    win a block max."""
    n_tiles = -(-M // tile_m)
    n_tiles8 = -(-n_tiles // 8) * 8
    pad = n_tiles8 * tile_m - M
    mul_p = jnp.pad(mul.astype(jnp.float32), (0, pad))
    add_p = jnp.pad(add.astype(jnp.float32), (0, pad),
                    constant_values=NEG_INF)
    return (mul_p.reshape(n_tiles8, tile_m),
            add_p.reshape(n_tiles8, tile_m))


def block_member_slots(blocks: jax.Array, tile_m: int,
                       block_r: int = BLOCK_R) -> jax.Array:
    """Expand kernel block ids [..., Kb] to their member row ids
    [..., Kb, block_r] under the strided-within-tile layout (see module
    docstring). Contiguous-layout expansion (the XLA fallback) is
    `blocks*R + arange(R)`."""
    L = tile_m // block_r
    return ((blocks[..., None] // L) * tile_m + (blocks[..., None] % L)
            + L * jnp.arange(block_r))


def _kernel(bank_ref, q_ref, mul_ref, add_ref, *rest, total_rows,
            tile_m, block_r, inv_scale, int8_via_bf16, has_qscale):
    """One grid step: score a [tile_m, D] bank tile against all queries,
    apply per-row affine metadata, reduce to [B, tile_m/block_r] maxima.

    rest = (qs_ref, out_ref) when has_qscale (qs_ref: [B, 1] f32
    per-query dequant scales) else (out_ref,)."""
    qs_ref, out_ref = rest if has_qscale else (None, rest[0])
    i = pl.program_id(0)
    nt = (((1,), (1,)), ((), ()))                         # q . bank^T
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
            q_ref[...].astype(jnp.bfloat16),
            bank_ref[...].astype(jnp.bfloat16),
            dimension_numbers=nt,
            preferred_element_type=jnp.float32)           # [B, tile_m]
    else:
        acc = jax.lax.dot_general(
            q_ref[...], bank_ref[...], dimension_numbers=nt,
            preferred_element_type=jnp.float32 if inv_scale is None
            else jnp.int32)                               # [B, tile_m]
    if inv_scale is not None:                             # int8 bank
        cos = acc.astype(jnp.float32) * inv_scale
        if qs_ref is not None:
            # per-query max-abs dequant: true cos = acc·q_scale·row_scale
            # / 127² (row_scale rides in `mul`). [B, 1] broadcasts over
            # the tile's lanes.
            cos = cos * qs_ref[...]
    else:                                                 # bf16 bank
        cos = acc
    # combined = w_c*strength*cos + (w_t*temporal*strength) per row, with
    # inactive rows already carrying add = NEG_INF from the caller.
    # mul/add ride in (8, tile_m) blocks (sublane-divisibility rule); this
    # step's row is selected by a masked cross-sublane sum (plain VPU ops,
    # no dynamic-slice support needed) -> [1, tile_m], then a native
    # sublane broadcast against [B, tile_m].
    r = jax.lax.rem(i, 8)
    row_mask = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == r) \
        .astype(jnp.float32)
    mul_row = jnp.sum(mul_ref[...] * row_mask, axis=0, keepdims=True)
    # add rows can be NEG_INF: select via where, not arithmetic (0 * -inf)
    add_row = jnp.max(jnp.where(row_mask > 0, add_ref[...], -jnp.inf),
                      axis=0, keepdims=True)
    combined = cos * mul_row + add_row
    # mask the padded tail of the final tile (M need not divide tile_m)
    col = i * tile_m + jax.lax.broadcasted_iota(
        jnp.int32, (1, tile_m), 1)
    combined = jnp.where(col < total_rows, combined, NEG_INF)
    # R-row block max as R elementwise maxes of 128-aligned lane slices
    # (no relayout). Block g of this tile holds rows {k*L + g : k < R}.
    L = tile_m // block_r
    bm = combined[:, :L]
    for kk in range(1, block_r):
        bm = jnp.maximum(bm, combined[:, kk * L:(kk + 1) * L])
    out_ref[...] = bm


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_m", "block_r",
                                    "int8_via_bf16"))
def flat_blockmax(bank_coarse: jax.Array, q: jax.Array, mul: jax.Array,
                  add: jax.Array, q_scale: jax.Array = None,
                  interpret: bool = False,
                  tile_m: int = TILE_M, block_r: int = BLOCK_R,
                  int8_via_bf16: bool = True) -> jax.Array:
    """Per-block maxima of the combined coarse score over the whole bank.

    bank_coarse: [M, D] int8 (127-scaled) or bf16 L2-normalized rows.
    q:           [B, D] queries, dtype matching the bank (int8 queries for
                 an int8 bank). B must be a multiple of 128 (pad + slice
                 at the caller).
    mul, add:    [n_tiles8, tile_m] f32 per-row affine metadata terms from
                 `pack_row_terms` (tile count rounded up to a multiple of
                 8): combined = mul * cos + add (add = -inf for dead
                 rows). The int8 accumulator's 1/127^2 dequantization is
                 applied IN-KERNEL — pass `mul` in cosine units for both
                 dtypes.
    q_scale:     optional [B] f32 per-query max-abs dequant scales (int8
                 banks): true cos = acc·q_scale·row_scale/127². Unit-norm
                 768-dim queries have components ~1/sqrt(D), so global
                 127-scale quantization uses only ~±5 int8 levels;
                 per-query max-abs uses the full range (~7× less noise) —
                 the same fix the bank rows got (engine._to_coarse_rows),
                 applied query-side so narrow funnels stop dropping
                 near-ties. None = global-scale queries (dequant 1/127²).

    Returns [B, n_tiles * tile_m / block_r] f32 block maxima under the
    strided-within-tile block layout (`block_member_slots`); padded tail
    blocks = -inf.
    """
    M, D = bank_coarse.shape
    B = q.shape[0]
    assert tile_m % (block_r * 128) == 0, (tile_m, block_r)
    n_tiles = pl.cdiv(M, tile_m)
    n_tiles8 = -(-n_tiles // 8) * 8
    L = tile_m // block_r
    n_blocks = n_tiles * L
    assert mul.shape == (n_tiles8, tile_m) == add.shape, \
        (mul.shape, add.shape, n_tiles8, tile_m)
    is_int8 = bank_coarse.dtype == jnp.int8
    has_qscale = q_scale is not None and is_int8
    kernel = functools.partial(
        _kernel, total_rows=M, tile_m=tile_m, block_r=block_r,
        inv_scale=(1.0 / (127.0 * 127.0)) if is_int8 else None,
        int8_via_bf16=int8_via_bf16, has_qscale=has_qscale)
    in_specs = [
        pl.BlockSpec((tile_m, D), lambda i: (i, 0)),      # bank tile
        pl.BlockSpec((B, D), lambda i: (0, 0)),           # queries
        # metadata rides in 8-tile groups (sublane-divisible block);
        # the kernel row-slices its own tile — same block index for 8
        # consecutive steps, so the pipeline skips the re-fetch
        pl.BlockSpec((8, tile_m), lambda i: (i // 8, 0)),  # mul rows
        pl.BlockSpec((8, tile_m), lambda i: (i // 8, 0)),  # add rows
    ]
    operands = [bank_coarse, q, mul, add]
    if has_qscale:
        # [B, 1] f32: tiled layout pads lanes to 128, but B <= ~1k makes
        # that ~512 KB — nothing like the [M, 1] 10M-row padding disaster
        # this kernel's v2 fixed (module docstring)
        in_specs.append(pl.BlockSpec((B, 1), lambda i: (0, 0)))
        operands.append(q_scale.astype(jnp.float32).reshape(B, 1))
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, L), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, n_blocks), jnp.float32),
        interpret=interpret,
    )(*operands)
