"""Limbic system: amygdala + hippocampal context.

Parity with `LimbicSystem` (/root/reference/src/core/limbic_system.py:48-87):
amygdala emotional assessment plus a hippocampal spatial-context hook. The
reference's `memory_context` is a declared-unfinished placeholder returning
None (:86); here it actually projects place-cell activity into model space
(completing the intended design rather than replicating the stub).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from aura_snn_rag_tpu.models.brain.amygdala import Amygdala


class LimbicSystem(nn.Module):
    d_model: int
    n_place_cells: int = 0   # 0 = no place-cell context path

    @nn.compact
    def __call__(self, x: jax.Array,
                 place_activity: Optional[jax.Array] = None
                 ) -> Dict[str, Any]:
        """x: [B, L, D]; place_activity: [Np] rates from the hippocampus."""
        emotional_state = Amygdala(self.d_model, name="amygdala")(x)
        memory_context = None
        if place_activity is not None and self.n_place_cells > 0:
            memory_context = nn.Dense(
                self.d_model, name="memory_proj")(
                place_activity.astype(x.dtype))
        return {"emotional_state": emotional_state,
                "memory_context": memory_context}
