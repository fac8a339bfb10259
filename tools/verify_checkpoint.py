"""Checkpoint audit: key-set diff vs a fresh model + numerical sanity.

Parity with the reference's operator-facing checkpoint verification story:
`/root/reference/verify_keys.py:1-86` (state-dict key comparison against a
freshly initialized model) and `/root/reference/verify_hippocampal_model.py`
(config inference from shapes + model rebuild + sanity checks). TPU-native
differences: checkpoints are Orbax directories, the "state dict" is a JAX
pytree keyed by path, and the template comes from `jax.eval_shape` over the
real model init (no device memory or weight download needed for the key
audit).

Usage:
    python tools/verify_checkpoint.py CKPT_DIR [--preset test|full|...]
                                      [--step N] [--deep]

  default: key/shape/dtype audit against the preset's freshly-built
           template (metadata only — fast, no array reads)
  --deep:  additionally restores arrays to host and scans every leaf for
           NaN/Inf, reports per-tensor norm outliers, and audits the
           episodic bank (occupancy vs strength rows, id-table sidecar).

Exit status 0 = checkpoint is sane; 1 = audit findings.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os


def _normalize(tree):
    """Convert a pytree to the plain-dict shape orbax StandardSave writes:
    namedtuples -> {field: ...}, sequences -> {'0': ..., '1': ...},
    mappings -> dict. Makes template and checkpoint keypaths comparable."""
    if hasattr(tree, "shape") or hasattr(tree, "dtype"):
        return tree                                     # array-like leaf
    if hasattr(tree, "_asdict"):                       # namedtuple
        return {k: _normalize(v) for k, v in tree._asdict().items()}
    if isinstance(tree, (list, tuple)):
        return {str(i): _normalize(v) for i, v in enumerate(tree)}
    if hasattr(tree, "keys"):                           # dict / FrozenDict
        return {k: _normalize(tree[k]) for k in tree.keys()}
    return tree                                         # scalar leaf


def _keypaths(tree):
    """Flatten a normalized pytree into {"['a']['b']": leaf}."""
    import jax
    flat, _ = jax.tree_util.tree_flatten_with_path(_normalize(tree))
    out = {}
    for path, leaf in flat:
        out[jax.tree_util.keystr(path)] = leaf
    return out


def build_template(preset: str):
    """Abstract {params, opt_state, memory_state, ...} template for a preset,
    built with eval_shape (no FLOPs, no device arrays).

    Mirrors the save payload of `training/checkpoint.py::CheckpointManager.save`
    piece by piece (model init, optax init, memory/cognitive-map init,
    modulator inits) instead of instantiating a Trainer, which materializes
    concrete arrays and host state that eval_shape cannot trace."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from aura_snn_rag_tpu import config as cfgmod
    from aura_snn_rag_tpu.memory.cognitive_map import init_cognitive_map
    from aura_snn_rag_tpu.memory.state import init_memory_state
    from aura_snn_rag_tpu.models.brain.amygdala import Amygdala
    from aura_snn_rag_tpu.models.brain.thalamus import Thalamus
    from aura_snn_rag_tpu.models.transformer import HippocampalTransformer
    from aura_snn_rag_tpu.training.schedule import warmup_cosine_schedule

    config = getattr(cfgmod, f"get_{preset}_config")()
    cfg, mcfg, tcfg = config.model, config.memory, config.training
    model = HippocampalTransformer(
        cfg, memory_config=mcfg if cfg.use_rag else None,
        deterministic=False)

    def init():
        key = jax.random.PRNGKey(0)
        memory_state = init_memory_state(mcfg)
        cognitive_map = init_cognitive_map(key, mcfg)
        L0 = min(8, cfg.max_seq_len)
        ids = jnp.zeros((2, L0), jnp.int32)
        init_kwargs = dict(use_memory=True, prosody=jnp.zeros((2, L0, 4)))
        if cfg.use_rag:
            init_kwargs["memory_state"] = memory_state
        params = model.init({"params": key, "dropout": key}, ids,
                            **init_kwargs)
        mu_dtype = (jnp.bfloat16 if tcfg.optimizer_mu_dtype == "bfloat16"
                    else None)
        tx = optax.chain(
            optax.clip_by_global_norm(tcfg.gradient_clip),
            optax.adamw(warmup_cosine_schedule(
                tcfg.lr, tcfg.warmup_steps, tcfg.max_steps,
                tcfg.min_lr_ratio),
                weight_decay=tcfg.weight_decay, mu_dtype=mu_dtype))
        out = {
            "params": params,
            "opt_state": tx.init(params),
            "step": jnp.asarray(0),
            "memory_state": memory_state,
            "cognitive_map": cognitive_map,
            "amygdala_params": {},
            "thalamus_params": {},
        }
        if tcfg.enable_amygdala:
            out["amygdala_params"] = Amygdala(cfg.embedding_dim).init(
                key, jnp.zeros((1, 4, cfg.embedding_dim)))
        if tcfg.enable_thalamus:
            out["thalamus_params"] = Thalamus(
                cfg.embedding_dim, ("language",), top_k=1).init(
                key, jnp.zeros((1, 4, cfg.embedding_dim)))
        return out

    tpl = jax.eval_shape(init)
    # the save path stores `step` as host numpy; normalize to its dtype
    tpl["step"] = np.asarray(0)
    return tpl


def audit_keys(ckpt_tree, template) -> list:
    """verify_keys.py-parity: missing / unexpected / mismatched entries."""
    import jax.numpy as jnp
    got = _keypaths(ckpt_tree)
    want = _keypaths(template)
    findings = []
    for k in sorted(set(want) - set(got)):
        findings.append(f"MISSING in checkpoint: {k} "
                        f"(model expects {jnp.shape(want[k])})")
    for k in sorted(set(got) - set(want)):
        findings.append(f"UNEXPECTED in checkpoint: {k} "
                        f"{tuple(getattr(got[k], 'shape', ()))}")
    for k in sorted(set(got) & set(want)):
        gs = tuple(getattr(got[k], "shape", ()))
        ws = tuple(jnp.shape(want[k]))
        if gs != ws:
            findings.append(f"SHAPE MISMATCH {k}: checkpoint {gs} vs "
                            f"model {ws}")
            continue
        gd = getattr(got[k], "dtype", None)
        wd = getattr(want[k], "dtype", None)
        if gd is not None and wd is not None and str(gd) != str(wd):
            findings.append(f"DTYPE MISMATCH {k}: checkpoint {gd} vs "
                            f"model {wd}")
    return findings


def deep_scan(restored, meta, max_report: int = 20) -> list:
    """Numerical sanity over every leaf + episodic-bank audit."""
    import numpy as np
    findings = []
    leaves = _keypaths(restored)
    norms = {}
    for k, v in leaves.items():
        a = np.asarray(v)
        if a.dtype.kind not in "fc":
            continue
        bad = int(np.sum(~np.isfinite(a.astype(np.float32))))
        if bad:
            findings.append(f"NONFINITE {k}: {bad}/{a.size} values")
        if a.size:
            norms[k] = float(np.sqrt(np.mean(
                np.square(a.astype(np.float32)))))
    # norm outliers among weight matrices only (biases/norm scales sit at
    # 0 or 1 by design and would skew a global median)
    pnorms = {k: v for k, v in norms.items()
              if k.startswith("['params']")
              and (k.endswith("['kernel']") or k.endswith("['embedding']"))}
    if pnorms:
        vals = np.array(list(pnorms.values()))
        med = float(np.median(vals[vals > 0])) if np.any(vals > 0) else 0.0
        for k, v in sorted(pnorms.items(), key=lambda kv: -kv[1]):
            if v > max(100.0, 1000 * med):
                findings.append(
                    f"NORM OUTLIER {k}: rms {v:.3g} vs kernel median "
                    f"{med:.3g} (exploded?)")
        dead = [k for k, v in pnorms.items() if v == 0.0]
        for k in dead[:max_report]:
            findings.append(f"ALL-ZERO KERNEL {k} (never trained?)")

    # episodic bank audit (verify_hippocampal_model parity, bank semantics)
    ms = restored.get("memory_state")
    if ms is not None:
        msk = _keypaths(ms)
        count = next((int(np.asarray(v)) for k, v in msk.items()
                      if k.endswith("['count']") or ".count" in k), None)
        strength = next((np.asarray(v) for k, v in msk.items()
                         if "strength" in k), None)
        if count is not None and strength is not None:
            live = int(np.sum(strength > 0))
            if live > count and count < strength.shape[0]:
                findings.append(
                    f"BANK: {live} rows with strength>0 but count={count}")
        ids = meta.get("slot_ids")
        if count is not None and ids is not None:
            named = sum(1 for s in ids if s)
            # 0 named slots is normal for trainer-written banks (device
            # writes use dense indices); a PARTIAL table means the sidecar
            # and the bank diverged (the failure the reference has silently:
            # id_to_idx dicts dropped on resume — SURVEY §5.4)
            if 0 < named < min(count, len(ids)):
                findings.append(
                    f"BANK: id table has only {named} named slots but "
                    f"count={count} (sidecar/bank divergence)")
    return findings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint_dir")
    ap.add_argument("--preset", default=None,
                    help="config preset to audit against (default: infer "
                         "from checkpoint shapes via inspect_checkpoint)")
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--deep", action="store_true",
                    help="restore arrays and run numerical sanity scans")
    args = ap.parse_args()

    # pin to CPU via config (env JAX_PLATFORMS is overridden by the
    # platform's sitecustomize, which pre-imports jax pinned to the TPU
    # tunnel — a CPU audit tool must never contend for the chip)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(args.checkpoint_dir))
    steps = mgr.all_steps()
    if not steps:
        print(f"no checkpoints under {args.checkpoint_dir}")
        return 1
    step = args.step if args.step is not None else steps[-1]
    print(f"auditing step {step} (available: {steps})")

    def step_metadata_tree(step_):
        """Checkpoint pytree with ArrayMetadata leaves (shape/dtype only —
        no array bytes read)."""
        md = ocp.StandardCheckpointer().metadata(
            os.path.join(os.path.abspath(args.checkpoint_dir),
                         str(step_), "default"))
        return getattr(md, "item_metadata", md)

    preset = args.preset
    if preset is None:
        # infer from checkpoint shapes, inspect_checkpoint.py-style
        from tools.inspect_checkpoint import infer_config_from_params
        meta_tree = step_metadata_tree(step)
        tree = meta_tree.get("params", meta_tree)
        inferred = infer_config_from_params(tree)
        ms = _keypaths(meta_tree.get("memory_state", {}))
        feats = next((v for k, v in ms.items()
                      if k.endswith("['features']")), None)
        if feats is not None:
            inferred["max_memories"] = getattr(feats, "shape", (None,))[0]
        from aura_snn_rag_tpu import config as cfgmod
        for name in ("test", "debug", "small", "medium", "full", "xl"):
            cc = getattr(cfgmod, f"get_{name}_config")()
            c = cc.model
            if (c.embedding_dim == inferred.get("embedding_dim")
                    and c.num_layers == inferred.get("num_layers")
                    and c.use_rag == any("memory_proj" in k
                                         for k in _keypaths(tree))
                    and ("max_memories" not in inferred
                         or cc.memory.max_memories
                         == inferred["max_memories"])):
                preset = name
                break
        if preset is None:
            print(f"cannot map inferred config {inferred} to a preset; "
                  f"pass --preset")
            return 1
        print(f"inferred preset: {preset} ({inferred})")

    template = build_template(preset)

    if args.deep:
        # restore against the checkpoint's OWN structure (metadata-derived,
        # to host numpy) so the scan works even when the artifact drifted
        # from the preset — drift is reported by the key audit, not fatal
        path = os.path.join(os.path.abspath(args.checkpoint_dir),
                            str(step), "default")
        ra = jax.tree.map(lambda m: ocp.RestoreArgs(restore_type=np.ndarray),
                          step_metadata_tree(step))
        restored = ocp.PyTreeCheckpointer().restore(
            path, args=ocp.args.PyTreeRestore(restore_args=ra))
        ckpt_tree = restored
    else:
        ckpt_tree = step_metadata_tree(step)

    findings = audit_keys(ckpt_tree, template)

    meta = {}
    mp = os.path.join(os.path.abspath(args.checkpoint_dir),
                      f"meta_{step}.json")
    if os.path.exists(mp):
        with open(mp) as f:
            meta = json.load(f)
    else:
        findings.append(f"MISSING sidecar meta_{step}.json "
                        f"(string-id table + host scalars)")

    if args.deep:
        findings.extend(deep_scan(restored, meta))

    n_keys = len(_keypaths(ckpt_tree))
    print(f"checkpoint keys: {n_keys}; template keys: "
          f"{len(_keypaths(template))}")
    if findings:
        print(f"\n{len(findings)} finding(s):")
        for f_ in findings:
            print(f"  - {f_}")
        return 1
    print("OK: all keys/shapes/dtypes match"
          + ("; all leaves finite, bank consistent" if args.deep else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
