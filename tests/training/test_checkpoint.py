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


class TestShardedBankCheckpoint:
    """Orbax save/restore of a SHARDED episodic bank must round-trip
    (VERDICT r1 #9): stacked [S, ...] per-shard states placed on a mesh
    survive a save → fresh-trainer restore → re-shard cycle bit-exactly."""

    def test_sharded_bank_roundtrip(self, tmp_path):
        import dataclasses
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import Mesh
        from aura_snn_rag_tpu.config import get_debug_config
        from aura_snn_rag_tpu.memory.sharded import (
            init_sharded_memory, write_memories_sharded)
        from aura_snn_rag_tpu.training.checkpoint import CheckpointManager
        from aura_snn_rag_tpu.training.trainer import Trainer

        cfg = get_debug_config()
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, use_rag=True),
            training=dataclasses.replace(
                cfg.training, enable_thalamus=False,
                enable_amygdala=False))
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4, 1),
                    ("data", "model"))

        tr = Trainer(cfg, seed=0)
        tr.shard_to_mesh(mesh, shard_memory=True)
        rng = np.random.RandomState(0)
        feats = rng.randn(8, cfg.memory.feature_dim).astype(np.float32)
        tr.hippocampus.state = write_memories_sharded(
            cfg.memory, mesh, tr.hippocampus.state,
            jnp.asarray(feats), jnp.zeros((8, cfg.memory.spatial_dims)))
        want_feats = np.asarray(tr.hippocampus.state.features)
        want_count = np.asarray(tr.hippocampus.state.count)
        assert want_count.shape == (4,) and (want_count == 2).all()

        ckpt = CheckpointManager(str(tmp_path / "ck"))
        ckpt.save(3, tr, loss=1.0)

        tr2 = Trainer(cfg, seed=1)
        tr2.shard_to_mesh(mesh, shard_memory=True)
        step = ckpt.restore(tr2)
        assert step == 3
        np.testing.assert_array_equal(
            np.asarray(tr2.hippocampus.state.features), want_feats)
        np.testing.assert_array_equal(
            np.asarray(tr2.hippocampus.state.count), want_count)

    def test_multislice_bank_roundtrip(self, tmp_path):
        """Same cycle on a ('replica','data','model') multislice mesh:
        the bank shards over replica x data (4 shards of 2 rows each)."""
        import dataclasses
        import jax
        import jax.numpy as jnp
        import numpy as np
        from aura_snn_rag_tpu.config import get_debug_config
        from aura_snn_rag_tpu.memory.sharded import write_memories_sharded
        from aura_snn_rag_tpu.parallel.distributed import multislice_mesh
        from aura_snn_rag_tpu.training.checkpoint import CheckpointManager
        from aura_snn_rag_tpu.training.trainer import Trainer

        cfg = get_debug_config()
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, use_rag=True),
            training=dataclasses.replace(
                cfg.training, enable_thalamus=False,
                enable_amygdala=False))
        mesh = multislice_mesh(n_slices=2, n_model=2)

        tr = Trainer(cfg, seed=0)
        tr.shard_to_mesh(mesh, shard_memory=True)
        assert tr._batch_axes == ("replica", "data")
        rng = np.random.RandomState(0)
        feats = rng.randn(8, cfg.memory.feature_dim).astype(np.float32)
        tr.hippocampus.state = write_memories_sharded(
            cfg.memory, mesh, tr.hippocampus.state,
            jnp.asarray(feats), jnp.zeros((8, cfg.memory.spatial_dims)),
            axis=("replica", "data"))
        want_feats = np.asarray(tr.hippocampus.state.features)
        want_count = np.asarray(tr.hippocampus.state.count)
        assert want_count.shape == (4,) and (want_count == 2).all()

        ckpt = CheckpointManager(str(tmp_path / "ck"))
        ckpt.save(5, tr, loss=1.0)

        tr2 = Trainer(cfg, seed=1)
        tr2.shard_to_mesh(mesh, shard_memory=True)
        step = ckpt.restore(tr2)
        assert step == 5
        np.testing.assert_array_equal(
            np.asarray(tr2.hippocampus.state.features), want_feats)
        np.testing.assert_array_equal(
            np.asarray(tr2.hippocampus.state.count), want_count)
