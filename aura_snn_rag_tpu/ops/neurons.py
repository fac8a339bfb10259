"""Spiking neuron dynamics as `jax.lax.scan` time-step kernels.

Behavioral parity (math, not code) with the reference's per-timestep Python
loops, which are the acknowledged hot loops (SURVEY.md §2.9):

- `lif_scan`       ↔ `VectorizedLIFNeuron`      /root/reference/src/base/neuron.py:115-139
- `izhikevich_scan`↔ `IzhikevichNeuron`          neuron.py:142-199
- `adex_scan`      ↔ `AdExNeuron`                neuron.py:202-251
- `gif_scan`       ↔ `GIFNeuron`/`BalancedGIFNeuron`
                     /root/reference/src/core/language_zone/gif_neuron.py:24-117

The membrane recurrences are linear-with-input between spikes, but the spike
reset makes them nonlinear per step, so `lax.scan` (compiled once, unrolled by
XLA into a tight on-chip loop) is the right TPU idiom. All functions are
time-major inside the scan and vmap cleanly over batch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from aura_snn_rag_tpu.ops.surrogate import heaviside_spike, multi_bit_spike


class LIFParams(NamedTuple):
    beta: jax.Array       # [D] membrane decay
    threshold: jax.Array  # [D]
    slope: jax.Array      # [D] learnable surrogate slope


def lif_params(size: int, beta: float = 0.5, threshold: float = 0.6,
               init_slope: float = 15.0, dtype=jnp.float32) -> LIFParams:
    return LIFParams(
        beta=jnp.full((size,), beta, dtype),
        threshold=jnp.full((size,), threshold, dtype),
        slope=jnp.full((size,), init_slope, dtype),
    )


def lif_scan(params: LIFParams, currents: jax.Array,
             mem0: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
    """LIF over a [..., T, D] current sequence.

    mem = beta*mem + I; spike = H(mem - threshold) (fast-sigmoid surrogate);
    soft reset mem -= spike*threshold. Returns (spikes [..., T, D], mem [..., D]).
    """
    *lead, T, D = currents.shape
    x = jnp.moveaxis(currents, -2, 0)  # [T, ..., D]
    if mem0 is None:
        mem0 = jnp.zeros(x.shape[1:], currents.dtype)

    def step(mem, i_t):
        mem = params.beta * mem + i_t
        spk = heaviside_spike(mem - params.threshold, params.slope)
        mem = mem - spk * params.threshold
        return mem, spk

    mem, spikes = jax.lax.scan(step, mem0, x)
    return jnp.moveaxis(spikes, 0, -2), mem


class IzhikevichParams(NamedTuple):
    a: jax.Array
    b: jax.Array
    c: jax.Array
    d: jax.Array
    dt: jax.Array


def izhikevich_params(a=0.02, b=0.2, c=-65.0, d=6.0, dt=0.2,
                      dtype=jnp.float32) -> IzhikevichParams:
    return IzhikevichParams(*(jnp.asarray(v, dtype) for v in (a, b, c, d, dt)))


def izhikevich_scan(params: IzhikevichParams, currents: jax.Array,
                    state: Optional[Tuple[jax.Array, jax.Array]] = None
                    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Izhikevich dynamics over [..., T, D] currents; spikes are hard (no grad).

    dv = 0.04 v^2 + 5 v + 140 - u + I; du = a(bv - u); spike at v>=30 with
    reset v<-c, u<-u+d (neuron.py:188-195).
    """
    x = jnp.moveaxis(currents, -2, 0)
    if state is None:
        v0 = jnp.full(x.shape[1:], -65.0, currents.dtype)
        u0 = params.b * v0
    else:
        v0, u0 = state

    def step(carry, i_t):
        v, u = carry
        v = v + params.dt * (0.04 * v * v + 5.0 * v + 140.0 - u + i_t)
        u = u + params.dt * (params.a * (params.b * v - u))
        spk = (v >= 30.0).astype(v.dtype)
        v = jnp.where(spk > 0, params.c, v)
        u = jnp.where(spk > 0, u + params.d, u)
        return (v, u), spk

    (v, u), spikes = jax.lax.scan(step, (v0, u0), x)
    return jnp.moveaxis(spikes, 0, -2), (v, u)


class AdExParams(NamedTuple):
    tau_m: jax.Array
    E_L: jax.Array
    V_T: jax.Array
    Delta_T: jax.Array
    R: jax.Array
    tau_w: jax.Array
    a: jax.Array
    b: jax.Array
    V_reset: jax.Array
    V_spike: jax.Array
    dt: jax.Array


def adex_params(C=200.0, g_L=10.0, E_L=-70.0, V_T=-50.0, Delta_T=2.0,
                tau_w=120.0, a=0.0, b=0.0, R=1.0, V_reset=-65.0,
                V_spike=30.0, dt=0.1, dtype=jnp.float32) -> AdExParams:
    tau_m = C / max(1e-6, g_L)
    vals = (tau_m, E_L, V_T, Delta_T, R, tau_w, a, b, V_reset, V_spike, dt)
    return AdExParams(*(jnp.asarray(v, dtype) for v in vals))


def adex_scan(params: AdExParams, currents: jax.Array,
              state: Optional[Tuple[jax.Array, jax.Array]] = None
              ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Adaptive-exponential IF over [..., T, D] currents (neuron.py:233-248)."""
    p = params
    x = jnp.moveaxis(currents, -2, 0)
    if state is None:
        V0 = jnp.full(x.shape[1:], p.E_L, currents.dtype)
        w0 = jnp.zeros_like(V0)
    else:
        V0, w0 = state

    def step(carry, i_t):
        V, w = carry
        exp_term = p.Delta_T * jnp.exp((V - p.V_T) / p.Delta_T)
        V = V + p.dt * ((-(V - p.E_L) + exp_term - p.R * w + p.R * i_t) / p.tau_m)
        w = w + p.dt * ((p.a * (V - p.E_L) - w) / p.tau_w)
        spk = (V >= p.V_spike).astype(V.dtype)
        V = jnp.where(spk > 0, p.V_reset, V)
        w = jnp.where(spk > 0, w + p.b, w)
        return (V, w), spk

    (V, w), spikes = jax.lax.scan(step, (V0, w0), x)
    return jnp.moveaxis(spikes, 0, -2), (V, w)


class GIFParams(NamedTuple):
    decay: jax.Array       # scalar exp(-dt/tau)
    threshold: jax.Array   # scalar baseline theta_0
    alpha: jax.Array       # scalar threshold adaptation rate
    levels: float          # static multi-bit level count L


def gif_params(levels: int = 16, dt: float = 1.0, tau: float = 10.0,
               threshold: float = 1.0, alpha: float = 0.01,
               dtype=jnp.float32) -> GIFParams:
    import math
    return GIFParams(
        decay=jnp.asarray(math.exp(-dt / tau), dtype),
        threshold=jnp.asarray(threshold, dtype),
        alpha=jnp.asarray(alpha, dtype),
        levels=float(levels),
    )


def gif_scan(params: GIFParams, currents: jax.Array,
             state: Optional[Tuple[jax.Array, jax.Array]] = None,
             unroll: bool | int = 1
             ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Generalized-IF multi-bit spiking over [..., T, D] currents.

    Per step (gif_neuron.py:54-71): v = v*decay + i; clamp to ±2·L·theta;
    spike = MultiBitSurrogate(v/theta, L); soft reset v -= spike*theta;
    adaptive threshold theta += alpha*spike - alpha*(theta - theta_0).
    """
    p = params
    x = jnp.moveaxis(currents, -2, 0)
    if state is None:
        v0 = jnp.zeros(x.shape[1:], currents.dtype)
        th0 = jnp.full(x.shape[1:], p.threshold, currents.dtype)
    else:
        v0, th0 = state

    def step(carry, i_t):
        v, theta = carry
        v = v * p.decay + i_t
        clamp = p.levels * theta * 2.0
        v = jnp.clip(v, -clamp, clamp)
        spk = multi_bit_spike(v / (theta + 1e-6), p.levels)
        v = v - spk * theta
        theta = theta + p.alpha * spk - p.alpha * (theta - p.threshold)
        return (v, theta), spk

    (v, theta), spikes = jax.lax.scan(step, (v0, th0), x, unroll=unroll)
    return jnp.moveaxis(spikes, 0, -2), (v, theta)


def gif_scan_const(params: GIFParams, current: jax.Array, timesteps: int,
                   state: Optional[Tuple[jax.Array, jax.Array]] = None
                   ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """GIF dynamics over `timesteps` steps of a CONSTANT [..., D] current.

    The reference's SNNFFN broadcasts each token to T identical timestep
    currents before the synapse/input linears (snn_ffn.py:69-70), which
    recomputes those matmuls T times for identical inputs. Running the
    linears once and scanning the constant current is mathematically
    identical (same matmul on the same values; only FMA-fusion-level
    float differences) and removes the T x redundant MXU work — the
    per-step state update is the only genuinely sequential part.

    T is small (default 4), so the loop is fully unrolled: XLA fuses the
    whole chain into one elementwise kernel that reads `current` once and
    keeps v/theta in registers instead of round-tripping HBM per step.

    Returns (spikes [..., T, D], (v, theta)).
    """
    p = params
    if state is None:
        v = jnp.zeros(current.shape, current.dtype)
        theta = jnp.full(current.shape, p.threshold, current.dtype)
    else:
        v, theta = state

    spikes = []
    for _ in range(timesteps):
        v = v * p.decay + current
        clamp = p.levels * theta * 2.0
        v = jnp.clip(v, -clamp, clamp)
        spk = multi_bit_spike(v / (theta + 1e-6), p.levels)
        v = v - spk * theta
        theta = theta + p.alpha * spk - p.alpha * (theta - p.threshold)
        spikes.append(spk)
    return jnp.stack(spikes, axis=-2), (v, theta)


def leaky_integrate(decay: jax.Array, x: jax.Array, axis: int = -2) -> jax.Array:
    """Linear leaky integrator v_t = decay*v_{t-1} + x_t via associative scan.

    Used where the reference runs per-timestep LIF chains without reset
    (multi_channel_attention.py:21-30) — the recurrence is linear, so
    `associative_scan` gives O(log T) depth on TPU (SURVEY.md §7.3).
    """
    x = jnp.moveaxis(x, axis, 0)
    decays = jnp.broadcast_to(decay, x.shape).astype(x.dtype)

    def combine(a, b):
        d1, v1 = a
        d2, v2 = b
        return d1 * d2, v2 + d2 * v1

    _, v = jax.lax.associative_scan(combine, (decays, x), axis=0)
    return jnp.moveaxis(v, 0, axis)
