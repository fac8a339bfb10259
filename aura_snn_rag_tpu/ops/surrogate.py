"""Surrogate-gradient spike functions as `jax.custom_vjp` rules.

Behavioral parity with the reference's autograd Functions:
- `multi_bit_spike` mirrors `MultiBitSurrogate`
  (/root/reference/src/core/language_zone/gif_neuron.py:6-22): forward is
  floor+clip to [0, L] multi-bit spikes; backward is a triangular STE
  `clip(1 - 2*|x - round(x)|, 0, 1)` masked to the in-range interval
  [0, L+1].
- `heaviside_spike` mirrors `LearnableSurrogateGradient`
  (/root/reference/src/base/neuron.py:70-111): Heaviside forward, fast-sigmoid
  surrogate backward for both the input and the learnable slope.

These are elementwise VPU ops; XLA fuses them into surrounding scans, so no
Pallas kernel is needed here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def multi_bit_spike(v: jax.Array, levels: float) -> jax.Array:
    """Multi-bit spike: floor(v) clipped to [0, levels]."""
    return jnp.clip(jnp.floor(v), 0.0, levels)


def _mbs_fwd(v, levels):
    return multi_bit_spike(v, levels), (v, levels)


def _mbs_bwd(res, g):
    v, levels = res
    dist = jnp.abs(v - jnp.round(v))
    grad_scale = jnp.clip(1.0 - 2.0 * dist, 0.0, 1.0)
    in_range = ((v >= 0.0) & (v <= levels + 1.0)).astype(g.dtype)
    return (g * in_range * grad_scale, None)


multi_bit_spike.defvjp(_mbs_fwd, _mbs_bwd)


@jax.custom_vjp
def heaviside_spike(v: jax.Array, slope: jax.Array) -> jax.Array:
    """Binary spike: 1 where v >= 0, with fast-sigmoid surrogate gradient.

    Backward (neuron.py:96-104): with s = slope,
      d/dv  = s / (1 + s*|v|)^2
      d/ds  = -v / (1 + s*|v|)^2   (the reference's exact slope rule —
              neuron.py:100-104); the elementwise grad is reduced over
              broadcast dims to match the slope parameter's shape.
    """
    return (v >= 0.0).astype(v.dtype)


def _hs_fwd(v, slope):
    return heaviside_spike(v, slope), (v, slope)


def _hs_bwd(res, g):
    v, slope = res
    denom = (1.0 + slope * jnp.abs(v)) ** 2
    dv = g * slope / denom
    # slope cotangent matches the reference rule exactly: -g*v/denom
    # (neuron.py:100-104) — sum over broadcast dims to `slope`'s shape.
    dslope_elem = -g * v / denom
    dslope = _reduce_to_shape(dslope_elem, jnp.shape(slope))
    return dv, dslope


def _reduce_to_shape(x, shape):
    if shape == ():
        return jnp.sum(x)
    # Sum leading broadcast dims, then any size-1 dims.
    extra = x.ndim - len(shape)
    if extra > 0:
        x = jnp.sum(x, axis=tuple(range(extra)))
    axes = tuple(i for i, (a, b) in enumerate(zip(x.shape, shape)) if b == 1 and a != 1)
    if axes:
        x = jnp.sum(x, axis=axes, keepdims=True)
    return x


heaviside_spike.defvjp(_hs_fwd, _hs_bwd)
