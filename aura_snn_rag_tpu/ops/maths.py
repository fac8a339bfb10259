"""L0 math primitives (SURVEY.md §2, layer L0).

Parity with `/root/reference/src/maths/`:
- `addition_linear`     ↔ AdditionLinear (addition_linear.py): addition-only
  linear via L1 distance, output = -Σ|w_i − x| (+ bias);
- `additive_receptance` ↔ AdditiveReceptance (additive_receptance.py):
  L1-distance pattern match → addition-only sigmoid approximation
  clip(0.5 + 0.25·x, 0, 1);
- `sign_activation`     ↔ SignActivation (sign_activation.py): sign(x − θ)
  with a triangular straight-through surrogate;
- `softmax`/`softplus`/`sigmoid` numpy helpers (softmax.py etc.).

Note on TPU idiom: the L1 "addition-only" ops are a neuromorphic-hardware
proxy; on TPU we express them as |x−w| reductions which the VPU executes
directly. `AdditionLinearModule` provides the flax wrapper used by brain
zones.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def addition_linear(x: jax.Array, weight_patterns: jax.Array,
                    bias=None) -> jax.Array:
    """x [..., D_in], weight_patterns [D_out, D_in] → [..., D_out]."""
    dists = jnp.sum(jnp.abs(x[..., None, :] - weight_patterns), axis=-1)
    out = -dists
    if bias is not None:
        out = out + bias
    return out


def additive_receptance(x: jax.Array, patterns: jax.Array,
                        threshold: jax.Array) -> jax.Array:
    """Addition-only sigmoid gate: clip(0.5 + 0.25·(θ − L1(x, p)), 0, 1)."""
    dists = jnp.sum(jnp.abs(x[..., None, :] - patterns), axis=-1)
    return jnp.clip(0.5 + 0.25 * (threshold - dists), 0.0, 1.0)


@jax.custom_vjp
def sign_activation(x: jax.Array, threshold: float = 0.0) -> jax.Array:
    return jnp.sign(x - threshold)


def _sign_fwd(x, threshold):
    return sign_activation(x, threshold), (x, threshold)


def _sign_bwd(res, g):
    x, threshold = res
    grad = jnp.clip(1.0 - jnp.abs(x - threshold), 0.0, 1.0)
    return (g * grad, None)


sign_activation.defvjp(_sign_fwd, _sign_bwd)


class AdditionLinearModule(nn.Module):
    """Flax wrapper over `addition_linear` (uniform ±0.1 init)."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight_patterns",
                       nn.initializers.uniform(scale=0.2),
                       (self.features, x.shape[-1]))
        # center uniform(0, 0.2) → (-0.1, 0.1)
        w = w - 0.1
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        return addition_linear(x, w, b)


# numpy scalar helpers (maths/softmax.py, softplus.py parity)
def softmax_np(x: np.ndarray, temp: float = 1.0) -> np.ndarray:
    x = np.asarray(x, np.float64) / max(1e-8, temp)
    x = x - np.max(x)
    e = np.exp(x)
    return e / (e.sum() + 1e-12)


def softplus_np(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)


def sigmoid_np(x):
    return 1.0 / (1.0 + np.exp(-np.asarray(x, np.float64)))
