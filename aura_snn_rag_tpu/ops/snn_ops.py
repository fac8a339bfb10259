"""SNN-flavored core ops.

Parity with `/root/reference/src/core/language_zone/snn_ops.py:8-223`:
spike-aware variants of matmul/softmax/silu/rmsnorm that currently reduce to
scaled standard ops (output / sqrt(fan_in) for the matmul :66-67), plus the
piecewise-LUT SiLU kept as a neuromorphic-hardware reference design
(:162-176).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def snn_matmul(spikes: jax.Array, weight: jax.Array,
               bias=None) -> jax.Array:
    """Spike-driven linear with 1/sqrt(fan_in) output scaling."""
    fan_in = spikes.shape[-1]
    out = spikes @ weight
    if bias is not None:
        out = out + bias
    return out / math.sqrt(fan_in)


def snn_softmax(x: jax.Array, axis: int = -1,
                temperature: float = 1.0) -> jax.Array:
    return jax.nn.softmax(x / max(temperature, 1e-6), axis=axis)


def snn_silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


def piecewise_silu(x: jax.Array) -> jax.Array:
    """Piecewise-linear LUT approximation of SiLU (snn_ops.py:162-176) —
    the hardware-reference design: 5 linear segments."""
    return jnp.where(
        x < -4.0, 0.0,
        jnp.where(x < -1.0, 0.05 * (x + 4.0) - 0.2,
                  jnp.where(x < 1.0, 0.5 * x * (1.0 + 0.25 * x),
                            jnp.where(x < 4.0, x - 0.3 + 0.05 * (x - 1.0),
                                      x))))


def snn_rmsnorm(x: jax.Array, scale: jax.Array,
                eps: float = 1e-6) -> jax.Array:
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * scale
