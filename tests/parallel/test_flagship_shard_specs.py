"""Flagship-shape SPMD partitioning check.

Compiles the full-preset train step (768D/12L/12H, seq 512, 100k bank —
the reference production config, colab_l4_training.py:166-180) against the
8-device multislice mesh. Toy dims mask real sharding-spec bugs (head
divisibility, bank remainders); they surface only at SPMD partitioning of
the real dims, which happens inside compile. This is the standalone
equivalent of __graft_entry__.dryrun_multichip's budget-gated
flagship-compile leg.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from aura_snn_rag_tpu.config import get_full_config
from aura_snn_rag_tpu.parallel.distributed import multislice_mesh
from aura_snn_rag_tpu.training.trainer import Trainer


@pytest.mark.slow
def test_flagship_train_step_compiles_on_multislice_mesh():
    devices = jax.devices()[:8]
    mesh = multislice_mesh(n_slices=2, n_model=2, devices=devices)

    full = get_full_config()
    full = full.replace(training=dataclasses.replace(
        full.training, memory_warmup_steps=0, batch_size=8))
    trainer = Trainer(full, seed=0)
    trainer.shard_to_mesh(mesh)

    B = full.training.batch_size
    L = full.model.max_seq_len
    ids = jnp.zeros((B, L), jnp.int32)
    step_fn = trainer._get_step_fn(True, True)
    lowered = step_fn.lower(
        trainer.state, trainer.hippocampus.state,
        trainer._place_batch(ids), trainer._place_batch(ids),
        jnp.ones(()), jax.random.PRNGKey(0), trainer.amygdala_params,
        trainer.thalamus_params)
    lowered.compile()  # SPMD partitioning at real dims happens here
