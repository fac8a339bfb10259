"""MNIST hybrid-pipeline gate (VERDICT r1 #5 / BASELINE.md row 1).

Reference benchmark: Whitener → OjaLayer → linear readout, 5 epochs,
94.34% published test accuracy (/root/reference/README-github.md:228,
tests/test_mnist_performance.py:51-170). The reference trains per-sample
in Python loops; here everything is batched JAX (whitener updates, Oja
Hebbian steps, logistic readout with optax) — the TPU-idiomatic form of
the same math.

Data: real MNIST when idx/npz files exist on disk (checked at the usual
paths); otherwise the bundled sklearn digits set (8×8, 1797 samples) as a
clearly-labeled offline proxy — this environment has zero network egress,
so torchvision's downloader cannot run.

    python benchmarks/bench_mnist.py [--epochs 5] [--hidden 1024]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

import numpy as np


def load_data():
    """→ (x_train, y_train, x_test, y_test, source_name)."""
    candidates = [
        "/root/data/mnist.npz",
        os.path.expanduser("~/.keras/datasets/mnist.npz"),
    ]
    for path in candidates:
        if os.path.exists(path):
            d = np.load(path)
            xtr = d["x_train"].reshape(-1, 784).astype(np.float32) / 255.0
            xte = d["x_test"].reshape(-1, 784).astype(np.float32) / 255.0
            # reference normalization (test_mnist_performance.py:61-62)
            xtr = (xtr - 0.1307) / 0.3081
            xte = (xte - 0.1307) / 0.3081
            return xtr, d["y_train"], xte, d["y_test"], "mnist"
    from sklearn.datasets import load_digits
    from sklearn.model_selection import train_test_split
    digits = load_digits()
    x = (digits.data / 16.0).astype(np.float32)
    x = (x - x.mean()) / (x.std() + 1e-8)
    xtr, xte, ytr, yte = train_test_split(
        x, digits.target, test_size=0.25, random_state=0,
        stratify=digits.target)
    return xtr, ytr, xte, yte, "sklearn-digits (offline MNIST proxy)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--oja-eta", type=float, default=0.001)
    ap.add_argument("--lr", type=float, default=5e-4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from aura_snn_rag_tpu.training.online import (
        init_oja, init_whitener, oja_forward, oja_step, whiten,
        whiten_update)

    xtr, ytr, xte, yte, source = load_data()
    D = xtr.shape[1]
    n_classes = int(ytr.max()) + 1
    # Oja is a subspace (PCA-like) rule: an over-complete basis (hidden > D)
    # makes the reconstruction residual explode and neurogenesis run away,
    # so cap the component count at the input dimension.
    hidden = min(args.hidden, D)
    print(f"data: {source}  train={xtr.shape} test={xte.shape} "
          f"components={hidden}", flush=True)

    t0 = time.time()
    key = jax.random.PRNGKey(0)
    whitener = init_whitener(D)
    oja = init_oja(key, D, hidden, max_components=max(2 * hidden, hidden + 8))

    # ---- phase 1: unsupervised whitener + Oja over the training stream ----
    rng = np.random.RandomState(0)
    n = len(xtr)
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        for i in range(0, n - args.batch + 1, args.batch):
            xb = jnp.asarray(xtr[order[i:i + args.batch]])
            whitener, xw = whiten_update(whitener, xb)
            oja, _ = oja_step(oja, xw, eta=args.oja_eta)

    # ---- phase 2: linear readout on the FROZEN basis ----
    feat_dim = int(oja.W.shape[1])
    feats_tr = np.asarray(oja_forward(oja, whiten(whitener, jnp.asarray(xtr))))
    feats_te = np.asarray(oja_forward(oja, whiten(whitener, jnp.asarray(xte))))

    W_ro = jnp.zeros((feat_dim, n_classes))
    b_ro = jnp.zeros((n_classes,))
    tx = optax.adam(args.lr * 10)
    params = (W_ro, b_ro)
    opt = tx.init(params)

    @jax.jit
    def readout_step(params, opt_state, feats, labels):
        def loss_fn(p):
            W, b = p
            logits = feats @ W + b
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    test_acc = 0.0
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n - args.batch + 1, args.batch):
            fb = jnp.asarray(feats_tr[order[i:i + args.batch]])
            yb = jnp.asarray(ytr[order[i:i + args.batch]])
            params, opt, loss = readout_step(params, opt, fb, yb)
            losses.append(float(loss))
        W, b = params
        preds = np.asarray(jnp.argmax(jnp.asarray(feats_te) @ W + b, axis=-1))
        test_acc = float((preds == np.asarray(yte)).mean())
        print(f"epoch {epoch + 1}: loss={np.mean(losses):.4f} "
              f"test_acc={test_acc * 100:.2f}%", flush=True)

    result = {
        "metric": "hybrid Whitener->Oja->readout test accuracy",
        "value": round(test_acc * 100, 2), "unit": "%",
        "dataset": source, "epochs": args.epochs,
        "reference_published": 94.34, "elapsed_s": round(time.time() - t0),
        "active_components": int(oja.K),
    }
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    main()
