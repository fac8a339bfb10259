"""MoE routing quality benchmark.

Parity with `/root/reference/benchmarks/bench_moe_routing.py:32-62`:
measures routing entropy, expert utilization balance, and specialization —
whether the Liquid-MoE router learns to separate synthetic input clusters
onto distinct experts.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from aura_snn_rag_tpu.models.brain.liquid_moe import LiquidMoERouter

    D, E, n_clusters = 32, 8, 4
    rng = np.random.RandomState(0)
    centers = rng.randn(n_clusters, D).astype(np.float32) * 3

    router = LiquidMoERouter(hidden_dim=64, num_experts=E, top_k=2)
    params = router.init(jax.random.PRNGKey(0), jnp.zeros((1, D)))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    # train the gate to route cluster i → expert i (supervised proxy)
    @jax.jit
    def step(params, opt_state, x, target):
        def loss_fn(p):
            out = router.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                jnp.log(out["probs"] + 1e-9), target).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(300):
        cid = rng.randint(0, n_clusters, 64)
        x = jnp.asarray(centers[cid] + 0.5 * rng.randn(64, D)
                        .astype(np.float32))
        params, opt_state, loss = step(params, opt_state, x,
                                       jnp.asarray(cid))

    # evaluate routing accuracy + utilization entropy
    cid = rng.randint(0, n_clusters, 512)
    x = jnp.asarray(centers[cid] + 0.5 * rng.randn(512, D)
                    .astype(np.float32))
    out = router.apply(params, x)
    top1 = np.asarray(out["indices"][:, 0])
    acc = float((top1 == cid).mean())
    usage = np.asarray(out["usage"])
    usage = usage / usage.sum()
    entropy = float(-(usage * np.log(usage + 1e-9)).sum() / np.log(E))

    print(json.dumps({
        "routing_accuracy": round(acc, 4),
        "utilization_entropy": round(entropy, 4),
        "final_loss": round(float(loss), 4),
    }))


if __name__ == "__main__":
    main()
