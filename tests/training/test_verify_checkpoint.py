"""Checkpoint audit tool (tools/verify_checkpoint.py).

Parity with the reference's operator story (`/root/reference/verify_keys.py`,
`verify_hippocampal_model.py`): a saved checkpoint audits clean against its
preset's template; injected drift (shape change, nonfinite values) is caught.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "tools"))

from aura_snn_rag_tpu.config import get_debug_config
from aura_snn_rag_tpu.training.checkpoint import CheckpointManager
from aura_snn_rag_tpu.training.trainer import Trainer
from verify_checkpoint import audit_keys, build_template, deep_scan


@pytest.fixture(scope="module")
def saved(tmp_path_factory):
    d = tmp_path_factory.mktemp("audit") / "ckpt"
    tr = Trainer(get_debug_config(), seed=0)
    rng = np.random.RandomState(0)
    batch = rng.randint(1, 500, (2, 16)).astype(np.int32)
    tr.train_step(batch, batch)
    ckpt = CheckpointManager(str(d))
    ckpt.save(1, tr, loss=2.0)
    return str(d)


def _metadata_tree(ckpt_dir, step):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp
    md = ocp.StandardCheckpointer().metadata(
        os.path.join(ckpt_dir, str(step), "default"))
    return getattr(md, "item_metadata", md)


def _restore_numpy(ckpt_dir, step):
    import jax
    import orbax.checkpoint as ocp
    meta = _metadata_tree(ckpt_dir, step)
    ra = jax.tree.map(lambda m: ocp.RestoreArgs(restore_type=np.ndarray),
                      meta)
    return ocp.PyTreeCheckpointer().restore(
        os.path.join(ckpt_dir, str(step), "default"),
        args=ocp.args.PyTreeRestore(restore_args=ra))


@pytest.mark.fast
def test_clean_checkpoint_audits_clean(saved):
    template = build_template("debug")
    findings = audit_keys(_metadata_tree(saved, 1), template)
    assert findings == [], findings


def test_shape_drift_is_caught(saved):
    import jax
    template = build_template("debug")
    # sabotage the template: pretend the model grew its vocab
    emb = template["params"]["params"]["semantic_encoder"][
        "token_embedding"]["embedding"]
    template["params"]["params"]["semantic_encoder"]["token_embedding"][
        "embedding"] = jax.ShapeDtypeStruct(
            (emb.shape[0] + 7, emb.shape[1]), emb.dtype)
    findings = audit_keys(_metadata_tree(saved, 1), template)
    assert any("SHAPE MISMATCH" in f and "token_embedding" in f
               for f in findings)


def test_missing_and_unexpected_keys(saved):
    template = build_template("debug")
    template["params"]["params"]["ghost_layer"] = {
        "kernel": template["params"]["params"]["final_norm"]["scale"]}
    tree = _metadata_tree(saved, 1)
    findings = audit_keys(tree, template)
    assert any("MISSING" in f and "ghost_layer" in f for f in findings)
    del template["params"]["params"]["ghost_layer"]
    del template["params"]["params"]["final_norm"]
    findings = audit_keys(tree, template)
    assert any("UNEXPECTED" in f and "final_norm" in f for f in findings)


def test_deep_scan_flags_nonfinite_and_passes_clean(saved):
    restored = _restore_numpy(saved, 1)
    meta = {"slot_ids": []}
    clean = deep_scan(restored, meta)
    assert clean == [], clean
    # inject a NaN
    k0 = restored["params"]["params"]["final_norm"]["scale"]
    k0 = np.asarray(k0).copy()
    k0[0] = np.nan
    restored["params"]["params"]["final_norm"]["scale"] = k0
    findings = deep_scan(restored, meta)
    assert any("NONFINITE" in f and "final_norm" in f for f in findings)


def test_preset_inference_from_shapes(saved):
    """The tool maps checkpoint shapes back to the generating preset."""
    from tools.inspect_checkpoint import infer_config_from_params
    tree = _metadata_tree(saved, 1)
    inferred = infer_config_from_params(tree.get("params", tree))
    from aura_snn_rag_tpu.config import get_debug_config
    c = get_debug_config().model
    assert inferred["embedding_dim"] == c.embedding_dim
    assert inferred["num_layers"] == c.num_layers
    assert inferred["vocab_size"] == c.vocab_size
