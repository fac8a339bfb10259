"""Checkpoint introspection: shapes, param counts, memory-bank occupancy.

Parity with `/root/reference/inspect_checkpoint.py` and the config-from-
shapes inference in `test_inference.py:16-41`.

    python tools/inspect_checkpoint.py checkpoints/
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
import os


def infer_config_from_params(params) -> dict:
    """Infer model architecture from parameter shapes (test_inference.py
    parity: the reference infers vocab/dim/layers from the state dict)."""
    import jax

    p = params.get("params", params)
    enc = p.get("semantic_encoder", {})
    emb = enc.get("token_embedding", {}).get("embedding")
    out = {}
    if emb is not None:
        out["vocab_size"], out["embedding_dim"] = emb.shape
    proj = enc.get("semantic_projection", {}).get("kernel")
    if proj is not None:
        out["n_place_cells"] = proj.shape[1]
    out["num_layers"] = sum(1 for k in p if k.startswith("layer_"))
    layer0 = p.get("layer_0", {})
    up = layer0.get("ffn", {}).get("up", {}).get("kernel")
    if up is None:
        up = layer0.get("ffn", {}).get("mlp", {}).get("up", {}).get("kernel")
    if up is not None:
        out["intermediate_size"] = up.shape[1]
    import numpy as _np
    out["param_count"] = sum(
        int(_np.prod(getattr(x, "shape", ()) or (1,)))
        for x in jax.tree.leaves(params))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint_dir")
    args = ap.parse_args()

    import numpy as np
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(args.checkpoint_dir))
    steps = mgr.all_steps()
    print(f"steps available: {steps}")
    if not steps:
        return
    step = steps[-1]
    restored = mgr.restore(step)
    params = restored.get("params", {})
    print(json.dumps(infer_config_from_params(params), indent=2,
                     default=str))
    mem = restored.get("memory_state")
    if mem is not None:
        count = int(np.asarray(mem[-4]))  # count field position
        print(f"memory bank: count={count}")
    meta_path = os.path.join(args.checkpoint_dir, f"meta_{step}.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        ids = [s for s in meta.get("slot_ids", []) if s]
        print(f"string ids stored: {len(ids)} (loss={meta.get('loss')})")


if __name__ == "__main__":
    main()
