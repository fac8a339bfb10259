"""Trainer integration tests: wake steps, loss decrease, sleep phase, EWC —
mirrors tests/training/test_hippocampal_trainer.py semantics plus the
modulator clamp contracts from test_ingestion_and_gating.py:82-96."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aura_snn_rag_tpu.config import get_debug_config
from aura_snn_rag_tpu.models.brain.endocrine import EndocrineSystem
from aura_snn_rag_tpu.training.trainer import Trainer


def tiny_config(**train_kw):
    cfg = get_debug_config()
    base = dict(batch_size=4, memory_warmup_steps=2,
                memory_store_interval=2, sleep_interval=1000,
                eval_steps=1000)
    base.update(train_kw)
    return cfg.replace(training=dataclasses.replace(cfg.training, **base))


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 500, (4, 16)).astype(np.int32)
    return ids


class TestTrainer:
    def test_loss_decreases_on_repeated_batch(self, batch):
        tr = Trainer(tiny_config(), seed=0)
        losses = [tr.train_step(batch, batch)["loss"] for _ in range(12)]
        assert losses[-1] < losses[0]
        assert all(np.isfinite(l) for l in losses)

    def test_memory_writes_after_warmup(self, batch):
        # thalamus off: with untrained (std 0.02) embeddings the thalamic
        # gate clamps to 0.5 and vetoes memory (reference semantics,
        # colab_l4_training.py:596-600) — here we test the warmup path
        tr = Trainer(tiny_config(enable_thalamus=False), seed=0)
        for _ in range(6):
            m = tr.train_step(batch, batch)
        # warmup=2, store every 2 steps → at least one batched write of B=4
        assert tr.hippocampus.memory_count >= 4
        assert m["use_memory"]

    def test_sleep_phase_runs(self, batch):
        tr = Trainer(tiny_config(sleep_interval=3), seed=0)
        for _ in range(4):
            tr.train_step(batch, batch)
        # sleep ran at step 3 without error; params still finite
        leaves = jax.tree.leaves(tr.state.params)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    def test_train_chunk_multi_step_dispatch(self, batch):
        tr = Trainer(tiny_config(enable_thalamus=False,
                                 memory_warmup_steps=0,
                                 memory_store_interval=2), seed=0)
        chunk = np.stack([batch, batch, batch, batch])  # [N=4, B, L]
        m = tr.train_chunk(chunk, chunk)
        assert int(tr.state.step) == 4
        assert np.isfinite(m["loss"])
        assert len(tr.history["loss"]) == 4
        # stores at inner steps 0 and 2 → 2 batches of 4 rows
        assert tr.hippocampus.memory_count == 8
        # chunks continue from prior state
        tr.train_chunk(chunk, chunk)
        assert int(tr.state.step) == 8

    def test_ewc_penalty_anchors(self, batch):
        tr = Trainer(tiny_config(), seed=0)
        tr.train_step(batch, batch)
        tr.consolidate_ewc([(jnp.asarray(batch), jnp.asarray(batch))])
        assert tr.ewc.fisher is not None
        p = float(tr.ewc.penalty(tr.state.params))
        assert p == pytest.approx(0.0, abs=1e-6)  # at anchor → zero
        tr.train_step(batch, batch)
        assert float(tr.ewc.penalty(tr.state.params)) >= 0.0


class TestEndocrineClamps:
    """The reference's asserted contracts (test_ingestion_and_gating.py:82-96)."""

    def test_lr_scale_clamped(self):
        assert EndocrineSystem.lr_scale({"dopamine": 100.0}) == 1.1
        assert EndocrineSystem.lr_scale({"cortisol": 100.0}) == 0.9
        assert EndocrineSystem.lr_scale({}) == 1.0

    def test_memory_gate_clamped(self):
        assert EndocrineSystem.memory_gate({"norepinephrine": 100.0}) == 1.2
        assert EndocrineSystem.memory_gate({"cortisol": 100.0}) == 0.8
        assert EndocrineSystem.memory_gate({}) == 1.0

    def test_hormone_dynamics(self):
        endo = EndocrineSystem()
        # sustained bad accuracy → stress → cortisol rises
        for _ in range(50):
            levels = endo.step({"accuracy": 0.0, "gate_diversity": 0.5,
                                "energy": 1.0})
        assert levels["cortisol"] > 0.0
        assert levels["norepinephrine"] > 0.0


def test_endocrine_memory_gating_knob():
    """endocrine_memory_gating=False keeps hormone LR scaling but removes
    the memory veto (long-run accuracy=exp(-loss) saturates low and would
    permanently disable episodic memory — observed on the 50k flagship)."""
    import dataclasses
    from aura_snn_rag_tpu import config as cfg_mod
    from aura_snn_rag_tpu.training.trainer import Trainer

    base = cfg_mod.get_debug_config()
    for gating, expect in ((True, False), (False, True)):
        c = base.replace(training=dataclasses.replace(
            base.training, endocrine_memory_gating=gating))
        tr = Trainer(c, seed=0)
        tr._memory_gate_scale = 0.85          # hormone gate below threshold
        tr._thalamus_scale = 1.0
        assert tr._modulator_gate_on() is expect
        # the thalamic veto still applies in both modes
        tr._thalamus_scale = 0.5
        assert tr._modulator_gate_on() is False
