"""Basal ganglia: gated integration of cortical region outputs.

Parity with `BasalGanglia` (/root/reference/src/core/basal_ganglia.py:12-57):
learnable per-region sigmoid gates, weighted sum normalized by total gate
weight, Linear + LayerNorm integration.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasalGanglia(nn.Module):
    d_model: int
    region_names: Tuple[str, ...]

    @nn.compact
    def __call__(self, cortical_outputs: Dict[str, jax.Array]
                 ) -> Optional[jax.Array]:
        if not cortical_outputs:
            return None
        integrated = None
        total_w = 0.0
        for name in self.region_names:
            if name not in cortical_outputs:
                continue
            w = jax.nn.sigmoid(self.param(
                f"gate_{name}", nn.initializers.constant(1.0), ()))
            contrib = cortical_outputs[name] * w
            integrated = contrib if integrated is None else integrated + contrib
            total_w = total_w + w
        if integrated is None:
            return None
        integrated = integrated / (total_w + 1e-6)
        h = nn.Dense(self.d_model, name="integration")(integrated)
        return nn.LayerNorm(name="integration_norm")(h)
