"""Orbax checkpoint round-trip: params + optimizer + memory bank + id table
(SURVEY §5.4 — including the string-id table the reference silently loses)."""

import numpy as np
import pytest

from aura_snn_rag_tpu.config import get_debug_config
from aura_snn_rag_tpu.training.checkpoint import CheckpointManager
from aura_snn_rag_tpu.training.trainer import Trainer
import dataclasses


def tiny_config():
    cfg = get_debug_config()
    return cfg.replace(training=dataclasses.replace(
        cfg.training, batch_size=4, memory_warmup_steps=0,
        memory_store_interval=1, enable_thalamus=False,
        sleep_interval=10_000, eval_steps=10_000))


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        cfg = tiny_config()
        tr = Trainer(cfg, seed=0)
        rng = np.random.RandomState(0)
        batch = rng.randint(1, 500, (4, 16)).astype(np.int32)
        for _ in range(3):
            tr.train_step(batch, batch)
        tr.hippocampus.write_batch(
            ["ck-a", "ck-b"], rng.randn(2, 64).astype(np.float32))

        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        ckpt.save(3, tr, loss=1.23)

        tr2 = Trainer(cfg, seed=99)
        step = CheckpointManager(str(tmp_path / "ckpt")).restore(tr2)
        assert step == 3
        # params identical
        import jax
        for a, b in zip(jax.tree.leaves(tr.state.params),
                        jax.tree.leaves(tr2.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # memory bank + string ids identical
        assert tr2.hippocampus.memory_count == tr.hippocampus.memory_count
        q = rng.randn(64).astype(np.float32)
        assert (tr.hippocampus.retrieve_similar_memories(q, k=3)
                == tr2.hippocampus.retrieve_similar_memories(q, k=3))
        # training continues from restored state
        m = tr2.train_step(batch, batch)
        assert np.isfinite(m["loss"])
