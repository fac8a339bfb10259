"""Emotion-classification E2E benchmark on real labeled text.

Parity with the reference's GoEmotions E2E benchmark
(/root/reference/benchmarks/bench_goemotion_e2e.py:1 — the reference ships
the harness but no recorded numbers). Label taxonomy = GoEmotions' 28
emotions.

Data sources, in order of preference:
1. `data/emotion_eval.jsonl` — a hand-curated offline set bundled with the
   repo (28 labels x 12 natural-language examples, Reddit-comment style).
   This environment has zero network egress, so the actual GoEmotions
   corpus cannot be downloaded; the bundled set gives a REAL-labeled
   accuracy number instead of a synthetic one.
2. `--goemotions` — the real GoEmotions split via HF datasets (needs
   network).
3. `--synthetic` — the old keyword-template fallback, kept only for
   harness smoke tests; its number is NOT a quality metric.

    python benchmarks/bench_emotion_e2e.py [--epochs 200]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os

import numpy as np

GOEMOTIONS_LABELS = [
    "admiration", "amusement", "anger", "annoyance", "approval", "caring",
    "confusion", "curiosity", "desire", "disappointment", "disapproval",
    "disgust", "embarrassment", "excitement", "fear", "gratitude", "grief",
    "joy", "love", "nervousness", "optimism", "pride", "realization",
    "relief", "remorse", "sadness", "surprise", "neutral",
]

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


def load_curated(path=None):
    """Bundled hand-curated set: [(text, label_id)], 28-way."""
    path = path or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "emotion_eval.jsonl")
    lab_idx = {n: i for i, n in enumerate(GOEMOTIONS_LABELS)}
    texts, labels = [], []
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            texts.append(row["text"])
            labels.append(lab_idx[row["label"]])
    return texts, np.asarray(labels), len(GOEMOTIONS_LABELS)


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
    return texts, np.asarray(labels), len(EMOTION_WORDS)


def load_goemotions(max_rows=2000):
    from datasets import load_dataset
    ds = load_dataset("go_emotions", "simplified", split="train")
    texts, labels = [], []
    for row in ds:
        if len(row["labels"]) == 1:
            texts.append(row["text"])
            labels.append(row["labels"][0])
        if len(texts) >= max_rows:
            break
    return texts, np.asarray(labels), len(GOEMOTIONS_LABELS)


def stratified_split(labels, test_frac=0.25, seed=0):
    """Per-class split so every label appears in train AND test."""
    rng = np.random.RandomState(seed)
    train_idx, test_idx = [], []
    for lab in np.unique(labels):
        idx = np.where(labels == lab)[0]
        rng.shuffle(idx)
        n_test = max(1, int(round(test_frac * len(idx))))
        test_idx.extend(idx[:n_test])
        train_idx.extend(idx[n_test:])
    return np.asarray(train_idx), np.asarray(test_idx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--synthetic", action="store_true",
                    help="keyword-template smoke corpus (NOT a quality "
                         "metric)")
    ap.add_argument("--goemotions", action="store_true",
                    help="real GoEmotions via HF datasets (needs network)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from aura_snn_rag_tpu.encoders import FastHashEmbedder
    from aura_snn_rag_tpu.models.emotion_head import (
        EmotionHeadConfig, EmotionPersonalityHead, emotion_multitask_loss)

    if args.synthetic:
        texts, labels, n_cls = synthetic_corpus()
        source = "synthetic (smoke only)"
    elif args.goemotions:
        texts, labels, n_cls = load_goemotions()
        source = "go_emotions"
    else:
        texts, labels, n_cls = load_curated()
        source = "curated_offline (data/emotion_eval.jsonl, real labels)"

    tr, te = stratified_split(labels)
    embedder = FastHashEmbedder(dim=1024)
    X = jnp.asarray(embedder.embed_batch(texts))
    y = jnp.asarray(labels)
    Xtr, ytr = X[tr], y[tr]
    Xte, yte = X[te], y[te]

    head = EmotionPersonalityHead(
        EmotionHeadConfig(d_model=1024, n_emotions=n_cls),
        deterministic=True)
    params = head.init(jax.random.PRNGKey(0), X[:1])
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def lf(p):
            logits = head.apply(p, Xtr)
            loss, _ = emotion_multitask_loss(logits, {"emotion": ytr})
            return loss
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(args.epochs):
        params, opt_state, loss = step(params, opt_state)

    logits = head.apply(params, Xte)
    pred = np.asarray(logits["emotion"].argmax(-1))
    acc = float((pred == np.asarray(yte)).mean())
    # top-3 accuracy: with 28 fine-grained emotions, near-synonym labels
    # (joy/excitement, anger/annoyance) share probability mass
    top3 = np.asarray(
        jnp.argsort(logits["emotion"], axis=-1)[:, -3:])
    acc3 = float(np.mean([y in row for y, row in
                          zip(np.asarray(yte), top3)]))
    print(json.dumps({
        "dataset": source,
        "n": len(texts),
        "n_classes": n_cls,
        "n_test": int(len(te)),
        "test_accuracy": round(acc, 4),
        "test_top3_accuracy": round(acc3, 4),
        "final_loss": round(float(loss), 4),
        "chance": round(1 / n_cls, 4),
    }))


if __name__ == "__main__":
    main()
