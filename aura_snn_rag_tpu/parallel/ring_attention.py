"""Ring attention: causal attention over a sequence-sharded mesh axis.

The reference has no sequence/context parallelism of any kind (SURVEY §2.8,
§5.7 — context is capped at max_seq_len=512 and long context is delegated
to the episodic memory bank). That delegation stays the PRIMARY long-context
mechanism here; this module closes the remaining §2.8 row for when the
attention window itself must outgrow one chip's HBM: classic ring attention
(blockwise online-softmax accumulation with K/V blocks rotating one ICI
neighbor hop per step), the TPU-native form of sequence parallelism.

Design:
- Q/K/V stay sharded [B, L/n, H, Dh] on a `seq` mesh axis; no gather of the
  full sequence ever materializes.
- n ring steps; at step j each device holds the K/V block originally from
  rank (i - j) mod n and folds it into a running (max, denominator,
  numerator) flash-style accumulator — mathematically exact softmax
  attention, independent of block arrival order.
- Causality is enforced by GLOBAL positions (rank-offset iota), so the
  result equals `jax.nn.dot_product_attention(..., is_causal=True)` on the
  unsharded sequence.
- One `ppermute` neighbor hop per step: traffic rides the ICI ring, never
  DCN (put `seq` on an inner mesh axis).
- Matmuls run in the input dtype (bf16 on TPU) with f32 accumulation
  (`preferred_element_type`); the softmax state (m, l, acc) is f32.

The simple ring computes fully-masked (future) blocks too — the standard
~2x causal FLOP overhead that striped/zigzag ring variants remove; at the
seq lengths this framework targets the step is ICI/HBM-bound, not
FLOP-bound, so the simple schedule is the right baseline.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   axis_name: str, causal: bool = True,
                   scale: Optional[float] = None) -> jax.Array:
    """Exact attention over a sequence-sharded axis. Call inside shard_map.

    q, k, v: [B, Lc, H, Dh] — the LOCAL sequence chunk (global L = Lc * n
    in ring order: rank r holds positions [r*Lc, (r+1)*Lc)).
    Returns [B, Lc, H, Dh] in q.dtype.
    """
    n = jax.lax.psum(1, axis_name)
    rank = jax.lax.axis_index(axis_name)
    B, Lq, H, Dh = q.shape
    scale = scale if scale is not None else Dh ** -0.5

    q_pos = rank * Lq + jnp.arange(Lq)                        # global [Lq]

    # The accumulators start replicated but the scan body makes them
    # device-varying; shard_map's VMA check requires carry in/out types to
    # match. Deriving the zeros FROM q gives them q's exact varying-axes
    # set (seq + any batch axes) for any mesh composition.
    qz = (q * 0).astype(jnp.float32)                          # [B,Lq,H,Dh]
    m0 = jnp.moveaxis(qz[..., 0], 1, 2) + NEG_INF             # [B,H,Lq]
    l0 = jnp.moveaxis(qz[..., 0], 1, 2)
    acc0 = qz
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, j):
        k_j, v_j, m, l, acc = carry
        src = (rank - j) % n                                  # block owner

        def fold(mla):
            m, l, acc = mla
            # scores with f32 MXU accumulation; inputs stay bf16 on TPU
            s = jax.lax.dot_general(
                q, k_j,
                dimension_numbers=(((3,), (3,)), ((0, 2), (0, 2))),
                preferred_element_type=jnp.float32) * scale   # [B,H,Lq,Lk]
            if causal:
                k_pos = src * Lq + jnp.arange(Lq)
                mask = k_pos[None, :] <= q_pos[:, None]       # [Lq, Lk]
                s = jnp.where(mask[None, None], s, NEG_INF)
            m_new = jnp.maximum(m, s.max(axis=-1))            # [B,H,Lq]
            # rows no block has touched yet keep m = NEG_INF; guard the
            # NEG_INF - NEG_INF = nan path explicitly
            alpha = jnp.exp(jnp.minimum(m - m_new, 0.0))
            alpha = jnp.where(m <= NEG_INF / 2, 0.0, alpha)   # [B,H,Lq]
            p = jnp.exp(s - m_new[..., None])
            p = jnp.where(s <= NEG_INF / 2, 0.0, p)           # [B,H,Lq,Lk]
            l_new = l * alpha + p.sum(axis=-1)
            pv = jax.lax.dot_general(
                p.astype(v_j.dtype), v_j,
                dimension_numbers=(((3,), (1,)), ((0, 1), (0, 2))),
                preferred_element_type=jnp.float32)           # [B,H,Lq,Dh]
            acc_new = (acc * jnp.moveaxis(alpha, 1, 2)[..., None]
                       + jnp.moveaxis(pv, 1, 2))              # [B,Lq,H,Dh]
            return (m_new, l_new, acc_new)

        if causal:
            # a block strictly in this rank's future is fully masked —
            # skip its matmuls at runtime (recovers the ~2x causal FLOP
            # overhead of the naive ring; cond compiles both branches,
            # executes one)
            m, l, acc = jax.lax.cond(src > rank,
                                     lambda mla: mla, fold, (m, l, acc))
        else:
            m, l, acc = fold((m, l, acc))
        k_j = jax.lax.ppermute(k_j, axis_name, perm)
        v_j = jax.lax.ppermute(v_j, axis_name, perm)
        return (k_j, v_j, m, l, acc), ()

    (_, _, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), jnp.arange(n))
    # causal guarantees every q row saw its own diagonal block -> l > 0
    out = acc / jnp.moveaxis(l, 1, 2)[..., None]
    return out.astype(q.dtype)


def sequence_sharded_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                               mesh: Mesh, seq_axis: str = "seq",
                               batch_axes=("data",),
                               head_axis: Optional[str] = None,
                               causal: bool = True) -> jax.Array:
    """shard_map wrapper: q/k/v [B, L, H, Dh] globally, L sharded over
    `seq_axis` (and B over `batch_axes`); returns attention output with the
    same sharding. The convenience entry for tests and model wiring.

    head_axis: optional mesh axis sharding H (tensor parallelism) — the
    ring is per-head math, so SP x TP composes with no extra collectives.
    """
    spec = P(batch_axes, seq_axis, head_axis)
    fn = jax.shard_map(
        functools.partial(ring_attention, axis_name=seq_axis,
                          causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def mesh_seq_axis(mesh, seq_axis: str = "seq") -> int:
    """Size of the mesh's sequence axis (1 = no sequence sharding)."""
    if mesh is None or seq_axis not in mesh.axis_names:
        return 1
    return mesh.shape[seq_axis]
