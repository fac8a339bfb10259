"""Liquid (CfC-style) cell and Liquid-MoE router.

Parity with /root/reference/src/core/liquid_moe.py:
- `LiquidCell` (:16-46): input-dependent time constant
  tau = clamp(tau_min + softplus(Vx), max=tau_max);
  h' = h + dt · (−h/tau + tanh(Wh + Ux));
- `LiquidMoERouter` (:48-97): one liquid step from zero state → gate logits →
  temperature scaled by attention gain → top-k softmax-renormalized weights.
  The expert-usage EMA is returned functionally (carried by the caller)
  instead of mutated in place.
- `BanditGating` (:106-136): UCB bandit over experts (host-side, legacy API).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class LiquidCell(nn.Module):
    hidden_dim: int
    dt: float = 0.02
    tau_min: float = 0.02
    tau_max: float = 2.0

    @nn.compact
    def __call__(self, x: jax.Array,
                 h_prev: Optional[jax.Array] = None) -> jax.Array:
        if h_prev is None:
            h_prev = jnp.zeros(x.shape[:-1] + (self.hidden_dim,), x.dtype)
        vx = nn.Dense(self.hidden_dim, kernel_init=nn.initializers.xavier_uniform(),
                      name="V")(x)
        tau = jnp.clip(self.tau_min + jax.nn.softplus(vx), max=self.tau_max)
        gates = jnp.tanh(
            nn.Dense(self.hidden_dim, kernel_init=nn.initializers.xavier_uniform(),
                     name="W")(h_prev)
            + nn.Dense(self.hidden_dim, kernel_init=nn.initializers.xavier_uniform(),
                       name="U")(x))
        dh = -h_prev / (tau + 1e-6) + gates
        return h_prev + self.dt * dh


class LiquidMoERouter(nn.Module):
    hidden_dim: int
    num_experts: int
    top_k: int = 2
    temperature: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array,
                 attn_gain: Optional[jax.Array] = None) -> Dict[str, Any]:
        """x: [B, D] pooled features → routing dict.

        Returns weights [B, k] (renormalized), indices [B, k], probs [B, E],
        and batch expert usage [E] (for the caller's EMA).
        """
        h = LiquidCell(self.hidden_dim, name="cell")(x)
        logits = nn.Dense(self.num_experts, name="gate_proj")(h)

        if attn_gain is not None:
            if attn_gain.ndim == 1:
                attn_gain = attn_gain[:, None]
            temp = jnp.clip(self.temperature / (attn_gain + 1e-6), 0.1, 5.0)
            logits = logits / temp
        else:
            logits = logits / self.temperature

        probs = jax.nn.softmax(logits, axis=-1)
        k = min(self.top_k, self.num_experts)
        topk_probs, topk_idx = jax.lax.top_k(probs, k)
        weights = topk_probs / (topk_probs.sum(axis=-1, keepdims=True) + 1e-8)

        usage = jnp.zeros((self.num_experts,)).at[topk_idx.reshape(-1)].add(
            1.0) / jnp.maximum(x.shape[0], 1)
        return {"weights": weights, "indices": topk_idx,
                "probs": probs, "usage": usage}


# Back-compat alias (liquid_moe.py:101-103)
LiquidGatingNetwork = LiquidMoERouter


class BanditGating:
    """UCB bandit gating (host-side numpy; legacy-test API parity)."""

    def __init__(self, n_experts: int, exploration_factor: float = 0.1):
        self.n_experts = n_experts
        self.exploration_factor = exploration_factor
        self.counts = np.zeros(n_experts) + 1e-6
        self.rewards = np.zeros(n_experts)
        self.timestep = 1

    def update(self, expert_idx: int, error: float) -> None:
        self.counts[expert_idx] += 1
        self.rewards[expert_idx] += max(0.0, 1.0 - error * 0.1)
        self.timestep += 1

    def get_ucb_scores(self) -> np.ndarray:
        avg = self.rewards / self.counts
        return avg + self.exploration_factor * np.sqrt(
            np.log(self.timestep) / self.counts)

    def select_top_k(self, k: int, base_gates: np.ndarray):
        scores = self.get_ucb_scores()
        top = scores.argsort()[::-1][:k]
        gates = base_gates.copy()
        if scores[top].sum() > 0:
            gates[top] = scores[top] / scores[top].sum()
        return top.tolist(), gates
