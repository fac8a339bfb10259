"""Online / local learning: Oja Hebbian layer, STDP token salience, whitener,
NLMS experts.

Parity map (SURVEY.md §2.6):
- `OjaState`/`oja_step` ↔ `OjaLayer` (/root/reference/src/training/
  hebbian_layer.py:15-123): y = xW; residual r = x − yWᵀ;
  dW = η·rᵀy/B; column renormalize; residual-EMA-triggered neurogenesis
  appends the normalized mean residual as a new component (static
  max_components buffer + active-K mask — the reference's own trick).
- `STDPState`/`stdp_process_sequence` ↔ the GPU STDP rewrite
  (stdp_learning-nick.py:17-150, the intended design per SURVEY §2.10):
  dense [vocab] weights, eligibility-trace recurrence
  trace[t] = trace[t-1]·exp(-1/τ) + spike[t], updates = lr⁺·trace·spike
  scatter-added per token, global decay + clamp; modulations = 1 + 0.2·w.
  TPU: the trace recurrence is linear → `associative_scan` (O(log T)).
- `WhitenerState` ↔ `OptimizedWhitener` (optimized_whitener.py:4-68):
  running mean/var with momentum, (x−μ)/√(σ²+ε).
- `NLMSExpert` ↔ `ExpertHead`/`NLMSExpertAdapter` (experts.py:7-93):
  w += μ·err·x/(‖x‖²+ε), μ decay, RMSE tracking. The reference's drifted
  adapter signature (SURVEY §2.11) is fixed here by a single clean class.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aura_snn_rag_tpu.ops.neurons import leaky_integrate


# ---------------------------------------------------------------------------
# Oja Hebbian layer with neurogenesis
# ---------------------------------------------------------------------------

class OjaState(NamedTuple):
    W: jax.Array            # [input_dim, max_components]
    K: jax.Array            # i32 active components
    residual_ema: jax.Array  # f32
    update_count: jax.Array  # i32


def init_oja(key: jax.Array, input_dim: int, n_components: int,
             max_components: int = 2048) -> OjaState:
    W = jax.random.normal(key, (input_dim, max_components)) * 0.02
    norm = jnp.linalg.norm(W, axis=0, keepdims=True) + 1e-12
    W = jnp.where(jnp.arange(max_components) < n_components, W / norm, W)
    return OjaState(W=W, K=jnp.asarray(n_components, jnp.int32),
                    residual_ema=jnp.zeros(()),
                    update_count=jnp.zeros((), jnp.int32))


def oja_forward(state: OjaState, x: jax.Array) -> jax.Array:
    """Projection y = x @ W (inactive components masked to 0)."""
    mask = jnp.arange(state.W.shape[1]) < state.K
    return (x @ state.W) * mask


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def oja_step(state: OjaState, x: jax.Array, eta: float = 0.01,
             alpha: float = 0.99, threshold: float = 2.0
             ) -> Tuple[OjaState, jax.Array]:
    """One Hebbian step on [B, input_dim] (or [input_dim]) whitened input."""
    if x.ndim == 1:
        x = x[None, :]
    B = x.shape[0]
    Mc = state.W.shape[1]
    mask = (jnp.arange(Mc) < state.K).astype(x.dtype)

    y = (x @ state.W) * mask                          # [B, Mc]
    x_hat = y @ state.W.T                              # [B, D]
    residual = x - x_hat
    norm_res = jnp.linalg.norm(residual, axis=1).mean()

    ema = jnp.where(state.update_count == 0, norm_res,
                    alpha * state.residual_ema + (1 - alpha) * norm_res)

    dW = eta * (residual.T @ y) / B
    W = state.W + dW * mask[None, :]
    col_norm = jnp.linalg.norm(W, axis=0, keepdims=True) + 1e-12
    W = jnp.where(mask[None, :] > 0, W / col_norm, W)

    # neurogenesis: append normalized mean residual at column K
    grow = (ema > threshold) & (state.K < Mc)
    new_w = residual.mean(axis=0)
    new_w = new_w / (jnp.linalg.norm(new_w) + 1e-12)
    col = jnp.minimum(state.K, Mc - 1)
    W = jnp.where(grow, W.at[:, col].set(new_w), W)
    K = jnp.where(grow, state.K + 1, state.K)
    ema = jnp.where(grow, ema * 0.5, ema)

    return OjaState(W, K, ema, state.update_count + 1), y


# ---------------------------------------------------------------------------
# STDP token-salience learner (vectorized, dense vocab buffer)
# ---------------------------------------------------------------------------

class STDPState(NamedTuple):
    token_weights: jax.Array  # [V]


def init_stdp(vocab_size: int, init: float = 0.5) -> STDPState:
    return STDPState(jnp.full((vocab_size,), init))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def stdp_process_sequence(state: STDPState, token_ids: jax.Array,
                          lr_plus: float = 0.01, time_window: int = 5,
                          decay: float = 0.99, w_min: float = 0.0,
                          w_max: float = 1.0,
                          spikes: Optional[jax.Array] = None
                          ) -> Tuple[STDPState, dict]:
    """token_ids [B, T] → updated state + stats.

    Eligibility traces via associative scan; scatter-add of lr⁺·trace·spike
    per token id; global decay + clamp.
    """
    if token_ids.ndim == 1:
        token_ids = token_ids[None, :]
    if spikes is None:
        spikes = jnp.ones(token_ids.shape, jnp.float32)
    trace_decay = math.exp(-1.0 / time_window)
    traces = leaky_integrate(jnp.asarray(trace_decay), spikes, axis=-1)
    updates = lr_plus * traces * spikes

    w = state.token_weights
    w = w.at[token_ids.reshape(-1)].add(updates.reshape(-1))
    w = jnp.clip(w * decay, w_min, w_max)

    stats = {
        "mean_weight": w.mean(),
        "max_weight": w.max(),
        "active_count": (w > 0.01).sum(),
    }
    return STDPState(w), stats


def stdp_modulations(state: STDPState, token_ids: jax.Array,
                     alpha: float = 0.2) -> jax.Array:
    """Per-token modulation factors 1 + α·w (lookup)."""
    return 1.0 + alpha * state.token_weights[token_ids]


# ---------------------------------------------------------------------------
# Running whitener
# ---------------------------------------------------------------------------

class WhitenerState(NamedTuple):
    mean: jax.Array
    var: jax.Array
    count: jax.Array


def init_whitener(dim: int) -> WhitenerState:
    return WhitenerState(jnp.zeros((dim,)), jnp.ones((dim,)),
                         jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnums=2)
def whiten_update(state: WhitenerState, x: jax.Array,
                  momentum: float = 0.01
                  ) -> Tuple[WhitenerState, jax.Array]:
    """Update running stats with [B, D] batch and return whitened batch."""
    if x.ndim == 1:
        x = x[None, :]
    bm = x.mean(axis=0)
    bv = x.var(axis=0)
    first = state.count == 0
    mean = jnp.where(first, bm, (1 - momentum) * state.mean + momentum * bm)
    # single-sample first batch has zero variance — keep the unit prior
    use_bv = first & (x.shape[0] > 1)
    var = jnp.where(use_bv, bv, (1 - momentum) * state.var + momentum * bv)
    var = jnp.where(first & (x.shape[0] <= 1), state.var, var)
    out = (x - mean) / jnp.sqrt(var + 1e-8)
    return WhitenerState(mean, var, state.count + 1), out


def whiten(state: WhitenerState, x: jax.Array) -> jax.Array:
    return (x - state.mean) / jnp.sqrt(state.var + 1e-8)


# ---------------------------------------------------------------------------
# NLMS expert (normalized least-mean-squares; host-friendly numpy)
# ---------------------------------------------------------------------------

class NLMSExpert:
    """Online NLMS regressor: w += μ·err·x/(‖x‖² + ε)."""

    def __init__(self, in_dim: int, lr: float = 0.5,
                 lr_decay: float = 0.9999, eps: float = 1e-6):
        self.w = np.zeros(in_dim, np.float32)
        self.mu = lr
        self.lr_decay = lr_decay
        self.eps = eps
        self._sq_err = 0.0
        self._n = 0

    def predict(self, x: np.ndarray) -> float:
        return float(np.dot(self.w, x))

    def update(self, x: np.ndarray, target: float) -> float:
        pred = self.predict(x)
        err = target - pred
        self.w += self.mu * err * x / (np.dot(x, x) + self.eps)
        self.mu *= self.lr_decay
        self._sq_err += err * err
        self._n += 1
        return err

    @property
    def rmse(self) -> float:
        return math.sqrt(self._sq_err / max(1, self._n))
