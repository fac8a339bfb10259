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

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS = True
except ImportError:  # pragma: no cover
    _PALLAS = False


def pallas_available() -> bool:
    return _PALLAS and jax.default_backend() != "cpu"


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
                pl.BlockSpec(memory_space=pltpu.ANY),      # flat bank (HBM)
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
