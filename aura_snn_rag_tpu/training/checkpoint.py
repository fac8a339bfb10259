"""Orbax checkpointing: params + optimizer + memory bank + id table.

Parity with the reference's checkpoint/resume (SURVEY §5.4):
`save_checkpoint` dict {step, model/optimizer state, loss}
(colab_l4_training.py:712-725), resume with optional optimizer state
(:799-824), `checkpoint_latest` convention
(aura_nemotron_cc2_pretraining.py:246-325).

Improvement over the reference: the hippocampal string-id table is saved
alongside the bank (the reference silently loses its id↔idx dicts on resume,
SURVEY §5.4).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper for the trainer's full state."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, trainer, loss: float = 0.0) -> None:
        hippo_sd = trainer.hippocampus.state_dict()
        slot_ids = hippo_sd.pop("slot_ids")
        payload = {
            "params": trainer.state.params,
            "opt_state": trainer.state.opt_state,
            "step": np.asarray(step),
            "memory_state": hippo_sd["memory_state"],
            "cognitive_map": hippo_sd["cognitive_map"],
            "amygdala_params": trainer.amygdala_params or {},
            "thalamus_params": trainer.thalamus_params or {},
        }
        self.manager.save(step, args=ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()
        # host-side metadata (string ids + scalars) as sidecar JSON
        meta = {
            "loss": loss,
            "slot_ids": list(slot_ids),
            "current_location":
                np.asarray(hippo_sd["current_location"]).tolist(),
            "writes_since_rebuild": hippo_sd["writes_since_rebuild"],
        }
        with open(os.path.join(self.directory, f"meta_{step}.json"),
                  "w") as f:
            json.dump(meta, f)

    def restore(self, trainer, step: Optional[int] = None,
                load_optimizer: bool = True,
                via_host: bool = True) -> int:
        """Restore trainer state.

        via_host=True (default) restores to host numpy and re-uploads:
        direct-to-device restore leaves arrays whose layouts defeat buffer
        donation in the compiled train step (the runtime inserts full copies
        of params+optimizer), which OOMs a full-preset trainer on one chip
        even though the same program ran before the save. The host hop
        reproduces cold-start device state exactly. The orbax read happens
        BEFORE the trainer's device state is released, so a failed restore
        (missing/corrupt files, template mismatch) leaves the trainer's
        initialized state intact. Note: the re-upload places arrays with
        default single-device sharding — a sharded trainer must re-apply its
        NamedShardings after restore (call Trainer.shard_to_mesh again).

        via_host=False restores direct-to-device, which requires releasing
        the initialized state first (both copies cannot be HBM-resident at
        full preset); a failure on that path leaves the trainer needing
        re-initialization, and the error says so.
        """
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return 0
        hippo_sd = trainer.hippocampus.state_dict()
        template = {
            "params": trainer.state.params,
            "opt_state": trainer.state.opt_state,
            "step": np.asarray(0),
            "memory_state": hippo_sd["memory_state"],
            "cognitive_map": hippo_sd["cognitive_map"],
            "amygdala_params": trainer.amygdala_params or {},
            "thalamus_params": trainer.thalamus_params or {},
        }
        # Abstract template: orbax's type dispatch rejects exotic leaf types
        # (e.g. JAX constant literals from flax constant initializers); only
        # shape/dtype matter for restore, so strip values entirely.
        import jax
        import jax.numpy as jnp
        init_opt_state = None if load_optimizer else trainer.state.opt_state
        if via_host:
            template = jax.tree.map(
                lambda x: np.empty(jnp.shape(x), jnp.result_type(x)),
                template)
            # host-side restore: no device memory touched yet, so the
            # trainer's initialized state survives any restore failure
            restored = self.manager.restore(
                step, args=ocp.args.StandardRestore(template))
            # Release the freshly-initialized device state BEFORE the
            # upload: otherwise params+optimizer+bank are resident twice,
            # which OOMs a full-preset trainer on one chip (and the leftover
            # fragmentation can sink the first train step even when the
            # restore itself survives).
            trainer.state = None
            trainer.hippocampus.state = None
            # upload: fresh device arrays with default layouts (donatable)
            restored = {
                k: jax.tree.map(jnp.asarray, v) if k != "step" else v
                for k, v in restored.items()}
        else:
            template = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(
                    jnp.shape(x), jnp.result_type(x)),
                template)
            trainer.state = None
            trainer.hippocampus.state = None
            try:
                restored = self.manager.restore(
                    step, args=ocp.args.StandardRestore(template))
            except Exception as e:
                raise RuntimeError(
                    "direct-to-device checkpoint restore failed after the "
                    "trainer's device state was released; re-create the "
                    "Trainer (or retry with via_host=True, which is "
                    "failure-safe)") from e

        meta_path = os.path.join(self.directory, f"meta_{step}.json")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)

        from aura_snn_rag_tpu.training.trainer import TrainState
        opt_state = (restored["opt_state"] if load_optimizer
                     else init_opt_state)
        trainer.state = TrainState(
            restored["params"], opt_state,
            jnp.asarray(int(restored["step"]), jnp.int32))
        trainer.hippocampus.load_state_dict({
            "memory_state": restored["memory_state"],
            "cognitive_map": restored["cognitive_map"],
            "slot_ids": meta.get("slot_ids",
                                 [""] * trainer.hippocampus.config.max_memories),
            "current_location": np.asarray(
                meta.get("current_location",
                         [0.0] * trainer.hippocampus.config.spatial_dims),
                np.float32),
            "writes_since_rebuild": meta.get("writes_since_rebuild", 0),
        })
        if restored.get("amygdala_params"):
            trainer.amygdala_params = restored["amygdala_params"]
        if restored.get("thalamus_params"):
            trainer.thalamus_params = restored["thalamus_params"]
        return int(restored["step"])
