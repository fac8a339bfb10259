"""Gradient accumulation correctness (VERDICT r1 weak #1 / ADVICE high).

The micro-batch path must consume the `labels` argument (not the inputs)
and per-micro-batch prosody; with dropout off and equal micro-batch sizes,
one accumulated step must match the unaccumulated step exactly.
Reference semantics: colab_l4_training.py:615-641.
"""

import dataclasses

import jax
import numpy as np
import pytest

from aura_snn_rag_tpu.config import get_debug_config
from aura_snn_rag_tpu.training.trainer import Trainer


def cfg_with(accum: int, **model_kw):
    cfg = get_debug_config()
    model = dataclasses.replace(cfg.model, dropout=0.0, **model_kw)
    # sparsity_lambda=0: the sparsity penalty (mean(activity) − target)² is
    # nonlinear in the batch, so exact accum↔unaccum equivalence only holds
    # for batch-linear losses (CE, entropy). With it on, the accum path
    # legitimately applies the penalty per micro-batch.
    training = dataclasses.replace(
        cfg.training, gradient_accumulation_steps=accum, batch_size=8,
        memory_warmup_steps=0, memory_store_interval=1,
        sparsity_lambda=0.0,
        sleep_interval=10_000, eval_steps=10_000)
    return cfg.replace(model=model, training=training)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    ids = rng.randint(1, 500, (8, 16)).astype(np.int32)
    labels = rng.randint(1, 500, (8, 16)).astype(np.int32)  # != inputs
    return ids, labels


def _params_after_steps(accum, ids, labels, n_steps=3, use_rag=True):
    # NOTE: the warmup schedule gives LR=0 at step 0, so a single step from
    # init is a no-op; run a few steps so updates actually land.
    tr = Trainer(cfg_with(accum, use_rag=use_rag), seed=3)
    with jax.default_matmul_precision("highest"):
        for _ in range(n_steps):
            out = tr.train_step(ids, labels)
    return tr, out


class TestGradAccumulation:
    def test_accum_matches_unaccumulated_step(self, data):
        ids, labels = data
        tr1, _ = _params_after_steps(1, ids, labels)
        tr4, _ = _params_after_steps(4, ids, labels)
        # sanity: params actually moved from a fresh init
        fresh = Trainer(cfg_with(1, use_rag=True), seed=3).state.params
        moved = max(
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(jax.tree.leaves(tr1.state.params),
                            jax.tree.leaves(fresh)))
        assert moved > 1e-6
        p1 = jax.tree.leaves(tr1.state.params)
        p4 = jax.tree.leaves(tr4.state.params)
        for a, b in zip(p1, p4):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)

    def test_accum_uses_labels_not_inputs(self, data):
        """Same inputs, different labels ⇒ different accumulated grads.

        (The r1 bug scored logits against the inputs, making the update
        invariant to `labels`.)
        """
        ids, labels = data
        other_labels = np.roll(labels, 3, axis=1)
        tr_a, _ = _params_after_steps(4, ids, labels)
        tr_b, _ = _params_after_steps(4, ids, other_labels)
        diffs = [
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(jax.tree.leaves(tr_a.state.params),
                            jax.tree.leaves(tr_b.state.params))]
        assert max(diffs) > 1e-5

    def test_accum_training_converges(self, data):
        ids, _ = data
        tr = Trainer(cfg_with(2), seed=0)
        losses = [tr.train_step(ids, ids)["loss"] for _ in range(8)]
        assert losses[-1] < losses[0]
        assert all(np.isfinite(l) for l in losses)

    def test_accum_memory_writes_land(self, data):
        ids, _ = data
        tr = Trainer(cfg_with(2), seed=0)
        for _ in range(3):
            tr.train_step(ids, ids)
        # stores happen per optimizer step: all micro-batch summaries write
        assert tr.hippocampus.memory_count >= ids.shape[0]
