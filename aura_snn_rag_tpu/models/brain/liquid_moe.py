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
    """UCB-1 expert selection, host-side (legacy-test API parity).

    Behavioral spec (not code) from the reference's bandit gate
    (/root/reference/src/core/liquid_moe.py:106-136): reward an expert
    with max(0, 1 - error/10) per update, score with a UCB exploration
    bonus, and renormalize the selected experts' gates by score mass.

    Implementation differs from the reference: mean reward is tracked
    incrementally (no reward-sum buffer), pulls start at zero with the
    bonus handling the cold start, and top-k uses argpartition
    (O(E) instead of a full sort).
    """

    def __init__(self, n_experts: int, exploration_factor: float = 0.1):
        self.n_experts = n_experts
        self.exploration_factor = exploration_factor
        self.mean_reward = np.zeros(n_experts, np.float64)
        self.pulls = np.zeros(n_experts, np.int64)
        self.total_pulls = 0

    def update(self, expert_idx: int, error: float) -> None:
        reward = max(0.0, 1.0 - 0.1 * error)
        self.pulls[expert_idx] += 1
        self.total_pulls += 1
        # incremental mean: m += (r - m) / n
        n = self.pulls[expert_idx]
        self.mean_reward[expert_idx] += (
            reward - self.mean_reward[expert_idx]) / n

    def get_ucb_scores(self) -> np.ndarray:
        # unpulled arms get the full exploration bonus via the epsilon floor
        eps = 1e-6
        t = max(self.total_pulls, 1) + 1
        bonus = np.sqrt(np.log(t) / (self.pulls + eps))
        return self.mean_reward + self.exploration_factor * bonus

    def select_top_k(self, k: int, base_gates: np.ndarray):
        scores = self.get_ucb_scores()
        k = min(k, self.n_experts)
        top = np.argpartition(-scores, k - 1)[:k]
        top = top[np.argsort(-scores[top])]
        gates = np.array(base_gates, copy=True)
        mass = float(scores[top].sum())
        if mass > 0:
            gates[top] = scores[top] / mass
        return top.tolist(), gates
