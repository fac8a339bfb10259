"""Emotion-classification E2E benchmark.

Parity with the reference's GoEmotions E2E benchmark (benchmarks/ —
SURVEY §6 note: the repo ships the harness but no recorded numbers).
Uses the GoEmotions dataset when HF is reachable; otherwise a synthetic
emotion-keyword corpus so the harness always produces a number.

    python benchmarks/bench_emotion_e2e.py [--epochs 30]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np

EMOTION_WORDS = {
    0: ("joy", "happy", "delighted", "wonderful", "love", "great"),
    1: ("sad", "unhappy", "depressed", "miserable", "crying", "loss"),
    2: ("angry", "furious", "rage", "annoyed", "hate", "outraged"),
    3: ("fear", "scared", "terrified", "anxious", "worried", "dread"),
    4: ("surprise", "astonished", "unexpected", "shocking", "sudden", "wow"),
    5: ("disgust", "gross", "revolting", "nasty", "repulsive", "awful"),
}

FILLER = ("the a it was and then very quite so really that this "
          "today yesterday about with from into over").split()


def synthetic_corpus(n=600, seed=0):
    rng = np.random.RandomState(seed)
    texts, labels = [], []
    for _ in range(n):
        lab = rng.randint(0, len(EMOTION_WORDS))
        words = list(rng.choice(FILLER, 6))
        for _ in range(2):
            words.insert(rng.randint(0, len(words)),
                         str(rng.choice(EMOTION_WORDS[lab])))
        texts.append(" ".join(words))
        labels.append(lab)
    return texts, np.asarray(labels)


def load_goemotions(max_rows=2000):
    from datasets import load_dataset
    ds = load_dataset("go_emotions", "simplified", split="train")
    texts, labels = [], []
    for row in ds:
        if len(row["labels"]) == 1 and row["labels"][0] < 6:
            texts.append(row["text"])
            labels.append(row["labels"][0])
        if len(texts) >= max_rows:
            break
    return texts, np.asarray(labels)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from aura_snn_rag_tpu.encoders import FastHashEmbedder
    from aura_snn_rag_tpu.models.emotion_head import (
        EmotionHeadConfig, EmotionPersonalityHead, emotion_multitask_loss)

    try:
        texts, labels = load_goemotions()
        source = "go_emotions"
    except Exception:  # noqa: BLE001 — offline fallback
        texts, labels = synthetic_corpus()
        source = "synthetic"

    n_train = int(0.8 * len(texts))
    embedder = FastHashEmbedder(dim=256)
    X = jnp.asarray(embedder.embed_batch(texts))
    y = jnp.asarray(labels)

    head = EmotionPersonalityHead(
        EmotionHeadConfig(d_model=256, n_emotions=6), deterministic=True)
    params = head.init(jax.random.PRNGKey(0), X[:1])
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    Xtr, ytr = X[:n_train], y[:n_train]

    @jax.jit
    def step(params, opt_state):
        def lf(p):
            logits = head.apply(p, Xtr)
            loss, _ = emotion_multitask_loss(
                logits, {"emotion": ytr})
            return loss
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(args.epochs):
        params, opt_state, loss = step(params, opt_state)

    logits = head.apply(params, X[n_train:])
    acc = float((logits["emotion"].argmax(-1) == y[n_train:]).mean())
    print(json.dumps({
        "dataset": source,
        "n": len(texts),
        "test_accuracy": round(acc, 4),
        "final_loss": round(float(loss), 4),
        "chance": round(1 / 6, 4),
    }))


if __name__ == "__main__":
    main()
