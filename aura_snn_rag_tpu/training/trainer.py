"""Training harness: wake/sleep phases, EWC, replay, modulator coupling.

Parity map:
- train loop semantics ↔ colab_l4_training.py:554-709 (§3.1): prosody from
  amygdala (stop-gradient), thalamic gating scalar, memory warmup +
  endocrine memory gate, store every `memory_store_interval` steps, periodic
  decay, LR modulation clamped to [0.9, 1.1];
- wake/sleep machine ↔ hippocampal_trainer.py:130-348: sleep every
  `sleep_interval` steps runs replay + time-reversed replay losses;
- `EWCConsolidator` ↔ hippocampal_trainer.py:71-128: Fisher = mean squared
  grads over validation batches; penalty λ·Σ F(θ−θ*)²;
- `ReplayBuffer` ↔ hippocampal_trainer.py:43-69 (host-side ring).

TPU-native differences: one fused jitted train step (forward, loss, grads,
optimizer update, episodic write) with donated state; bf16 natively (no
GradScaler); modulator scalars stay on device inside the step, with the
thalamus gate consumed at one-step lag to avoid a host sync per step.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aura_snn_rag_tpu.config import AuraConfig
from aura_snn_rag_tpu.memory import engine as memory_engine
from aura_snn_rag_tpu.memory.hippocampus import HippocampalFormation
from aura_snn_rag_tpu.memory.state import MemoryState
from aura_snn_rag_tpu.models.brain.amygdala import Amygdala, build_prosody
from aura_snn_rag_tpu.models.brain.endocrine import EndocrineSystem
from aura_snn_rag_tpu.models.brain.thalamus import Thalamus
from aura_snn_rag_tpu.models.transformer import HippocampalTransformer
from aura_snn_rag_tpu.training.losses import hippocampal_loss
from aura_snn_rag_tpu.training.schedule import warmup_cosine_schedule


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def _sharded_retrieve_adapter(mesh, axis, memory_config, memory_state,
                              queries, k):
    """retrieve_fn adapter for the shard_map sharded-bank path."""
    from aura_snn_rag_tpu.memory.sharded import retrieve_sharded
    return retrieve_sharded(memory_config, mesh, memory_state, queries, k,
                            axis=axis)


class ReplayBuffer:
    """Host-side ring buffer of (input_ids, labels) batches with losses."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self._items = []
        self._pos = 0

    def __len__(self):
        return len(self._items)

    def add(self, input_ids: np.ndarray, labels: np.ndarray, loss: float):
        item = (np.asarray(input_ids), np.asarray(labels), float(loss))
        if len(self._items) < self.capacity:
            self._items.append(item)
        else:
            self._items[self._pos] = item
            self._pos = (self._pos + 1) % self.capacity

    def sample(self, n: int, rng: np.random.RandomState):
        idx = rng.permutation(len(self._items))[:n]
        return [self._items[i] for i in idx]


class EWCConsolidator:
    """Elastic weight consolidation: Fisher-weighted quadratic anchor."""

    def __init__(self, ewc_lambda: float):
        self.ewc_lambda = ewc_lambda
        self.fisher = None
        self.theta_star = None

    def consolidate(self, loss_grad_fn, params, batches, max_batches=50):
        sq_sum = None
        n = 0
        for batch in batches[:max_batches]:
            grads = loss_grad_fn(params, batch)
            sq = jax.tree.map(lambda g: g.astype(jnp.float32) ** 2, grads)
            sq_sum = sq if sq_sum is None else jax.tree.map(
                jnp.add, sq_sum, sq)
            n += 1
        if n == 0:
            return
        self.fisher = jax.tree.map(lambda s: s / n, sq_sum)
        self.theta_star = jax.tree.map(jnp.copy, params)

    def penalty(self, params) -> jax.Array:
        if self.fisher is None:
            return jnp.zeros(())
        terms = jax.tree.map(
            lambda f, p, t: (f * (p.astype(jnp.float32)
                                  - t.astype(jnp.float32)) ** 2).sum(),
            self.fisher, params, self.theta_star)
        return self.ewc_lambda * sum(jax.tree.leaves(terms))


class Trainer:
    """End-to-end training harness for the hippocampal transformer."""

    def __init__(self, config: AuraConfig, seed: int = 0):
        self.config = config
        mcfg = config.memory
        cfg = config.model
        tcfg = config.training

        self.model = HippocampalTransformer(
            cfg, memory_config=mcfg if cfg.use_rag else None,
            deterministic=False)
        self.eval_model = HippocampalTransformer(
            cfg, memory_config=mcfg if cfg.use_rag else None,
            deterministic=True)
        self.hippocampus = HippocampalFormation(mcfg, seed=seed + 1)

        key = jax.random.PRNGKey(seed)
        self.rng, init_key, amy_key = jax.random.split(key, 3)
        L0 = min(8, cfg.max_seq_len)
        ids = jnp.zeros((2, L0), jnp.int32)
        init_kwargs = dict(use_memory=True,
                           prosody=jnp.zeros((2, L0, 4)))
        if cfg.use_rag:
            init_kwargs["memory_state"] = self.hippocampus.state
        self.params = self.model.init(
            {"params": init_key, "dropout": init_key}, ids, **init_kwargs)

        self.schedule = warmup_cosine_schedule(
            tcfg.lr, tcfg.warmup_steps, tcfg.max_steps, tcfg.min_lr_ratio)
        mu_dtype = (jnp.bfloat16 if tcfg.optimizer_mu_dtype == "bfloat16"
                    else None)
        self.tx = optax.chain(
            optax.clip_by_global_norm(tcfg.gradient_clip),
            optax.adamw(self.schedule, weight_decay=tcfg.weight_decay,
                        mu_dtype=mu_dtype),
        )
        self.opt_state = self.tx.init(self.params)
        self.state = TrainState(self.params, self.opt_state,
                                jnp.zeros((), jnp.int32))

        # modulators
        self.amygdala = None
        self.amygdala_params = None
        if tcfg.enable_amygdala:
            self.amygdala = Amygdala(cfg.embedding_dim)
            self.amygdala_params = self.amygdala.init(
                amy_key, jnp.zeros((1, 4, cfg.embedding_dim)))
        self.endocrine = (EndocrineSystem() if tcfg.enable_endocrine
                          else None)
        self.thalamus = None
        self.thalamus_params = None
        if tcfg.enable_thalamus:
            # single-region routing, as the reference's LM loop wires it
            # (colab_l4_training.py:829: region_names=['language'], top_k=1)
            self.thalamus = Thalamus(
                cfg.embedding_dim, ("language",), top_k=1)
            self.thalamus_params = self.thalamus.init(
                amy_key, jnp.zeros((1, 4, cfg.embedding_dim)))

        self.mesh = None
        self._memory_mesh = None
        self._batch_axes = ("data",)
        self._seq_axis = None
        self.replay = ReplayBuffer(tcfg.replay_buffer_size)
        self.ewc = EWCConsolidator(tcfg.ewc_lambda)
        # observability spine (SURVEY §5.1): stats + event hooks
        from aura_snn_rag_tpu.zones.events import EventBus
        from aura_snn_rag_tpu.zones.stats import StatsCollector
        self.stats = StatsCollector()
        self.event_bus = EventBus()
        self._np_rng = np.random.RandomState(seed)
        self._memory_gate_scale = 1.0
        self._thalamus_scale = 1.0
        self.history: Dict[str, list] = {"loss": [], "step": []}

        self._step_fns: Dict[Tuple[bool, bool, bool], Any] = {}

    # ------------------------------------------------------------------
    # multi-device placement
    # ------------------------------------------------------------------
    def shard_to_mesh(self, mesh, shard_memory: bool = True) -> None:
        """Place the trainer's state onto a ('data','model') mesh: params
        tensor-parallel per the TP rules, optimizer state mirrors params,
        modulators replicated, batches sharded over 'data' (by `train_step`
        on entry).

        shard_memory=True additionally shards the episodic bank over 'data'
        (SURVEY §5.7 design): a FRESH per-shard bank is created (per-shard
        capacity = memory.max_memories), in-step writes land on the local
        shard, and RAG retrieval merges per-shard top-k over ICI via the
        model's injectable `retrieve_fn`. An existing single-shard bank is
        not migrated — re-ingest after sharding.

        Multi-slice meshes (parallel.distributed.multislice_mesh) work
        transparently: every non-'model' axis becomes a batch/bank axis,
        so on a ('replica','data','model') mesh batches and the bank shard
        over replica×data and retrieval merges hierarchically (ICI first,
        DCN sees only the per-slice survivors).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        from aura_snn_rag_tpu.parallel.mesh import shard_params

        pcfg = self.config.parallel
        seq_ax = pcfg.seq_axis_name
        self._seq_axis = None
        if seq_ax in mesh.axis_names and mesh.shape[seq_ax] > 1:
            # sequence parallelism (AuraConfig.parallel.seq_shards): batches
            # shard [B, L] over (batch_axes, seq); attention cores run the
            # ring over the 'seq' axis (models get the mesh below)
            assert self.config.model.max_seq_len % mesh.shape[seq_ax] == 0, (
                self.config.model.max_seq_len, mesh.shape[seq_ax])
            self._seq_axis = seq_ax
        self._batch_axes = tuple(
            a for a in mesh.axis_names
            if a not in ("model", seq_ax, pcfg.stage_axis_name))
        if self._seq_axis is not None:
            self.model = self.model.clone(mesh=mesh)
            self.eval_model = self.eval_model.clone(mesh=mesh)

        params = shard_params(self.state.params, mesh)
        opt_state = self.tx.init(params)  # zeros_like inherits shardings
        self.state = TrainState(params, opt_state, self.state.step)

        repl = NamedSharding(mesh, P())
        put_repl = lambda t: jax.tree.map(
            lambda x: jax.device_put(x, repl), t)
        if self.amygdala_params is not None:
            self.amygdala_params = put_repl(self.amygdala_params)
        if self.thalamus_params is not None:
            self.thalamus_params = put_repl(self.thalamus_params)

        self._memory_mesh = None
        if shard_memory and self.config.model.use_rag:
            from aura_snn_rag_tpu.memory.sharded import (
                init_sharded_memory, retrieve_sharded)
            self.hippocampus.state = init_sharded_memory(
                self.config.memory, mesh, axis=self._batch_axes)
            self._memory_mesh = mesh
            retrieve_fn = functools.partial(
                _sharded_retrieve_adapter, mesh, self._batch_axes)
            self.model = self.model.clone(retrieve_fn=retrieve_fn)
            self.eval_model = self.eval_model.clone(
                retrieve_fn=retrieve_fn)
        else:
            self.hippocampus.state = put_repl(self.hippocampus.state)
        self.mesh = mesh
        self._step_fns.clear()
        if hasattr(self, "_eval_fn"):
            del self._eval_fn            # eval_model was re-cloned

    def _place_batch(self, x):
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P
        x = jnp.asarray(x)
        axes = getattr(self, "_batch_axes", ("data",))
        seq_ax = getattr(self, "_seq_axis", None)
        spec = (P(axes, seq_ax) if seq_ax is not None and x.ndim >= 2
                else P(axes))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    # ------------------------------------------------------------------
    # jitted step builders
    # ------------------------------------------------------------------
    def _build_step(self, use_memory: bool, store_memory,
                    reverse_replay: bool):
        """store_memory: True/False (static) or the string \"traced\" —
        traced mode adds a `store_flag` scalar argument and wraps only the
        episodic write in lax.cond, so the chunk path compiles ONE step
        body instead of two (halves the chunk graph / compile memory)."""
        model = self.model
        cfg = self.config.model
        tcfg = self.config.training
        mcfg = self.config.memory
        tx = self.tx
        amygdala = self.amygdala
        thalamus = self.thalamus
        ewc = self.ewc
        memory_mesh = self._memory_mesh

        def step_fn(state: TrainState, memory_state: MemoryState,
                    input_ids, labels, lr_scale, dropout_rng,
                    amygdala_params, thalamus_params, store_flag=None):
            # --- prosody from amygdala on token embeddings (stop-grad) ---
            prosody = None
            thalamus_scale = jnp.ones(())
            if amygdala is not None or thalamus is not None:
                emb_table = state.params["params"]["semantic_encoder"][
                    "token_embedding"]["embedding"]
                token_embeds = jax.lax.stop_gradient(
                    jnp.asarray(emb_table)[input_ids].astype(jnp.float32))
            if amygdala is not None:
                limbic = amygdala.apply(amygdala_params, token_embeds)
                prosody = build_prosody(
                    limbic["arousal"], limbic["valence"],
                    input_ids.shape[0], input_ids.shape[1])
                arousal = limbic["arousal"]
            else:
                arousal = jnp.zeros(())
            if thalamus is not None:
                routed, _ = thalamus.apply(
                    thalamus_params, token_embeds,
                    {"arousal": arousal})
                lang = routed["language"]
                thalamus_scale = jnp.clip(
                    jnp.abs(lang).mean(), 0.5, 1.5)

            def batch_loss(params, ids_i, labels_i, prosody_i, rng_i):
                """(loss-with-regularizers, (ce, out)) for one (micro)batch.

                EWC is NOT included here: the accumulation path adds its
                gradient once per optimizer step (not once per micro-batch),
                matching the reference's accumulate-then-penalize semantics
                (colab_l4_training.py:615-641).
                """
                out, _ = model.apply(
                    params, ids_i, prosody=prosody_i,
                    use_memory=use_memory,
                    memory_state=memory_state if cfg.use_rag else None,
                    rngs={"dropout": rng_i})
                logits = out.logits[:, :-1]
                ce = hippocampal_loss(
                    logits, labels_i[:, 1:], None,
                    label_smoothing=0.0, entropy_lambda=0.0,
                    sparsity_lambda=0.0)
                loss = hippocampal_loss(
                    logits, labels_i[:, 1:], out.place_activity,
                    label_smoothing=tcfg.label_smoothing,
                    entropy_lambda=tcfg.entropy_lambda,
                    sparsity_lambda=tcfg.sparsity_lambda,
                    target_sparsity=tcfg.target_sparsity)
                if reverse_replay:
                    out_r, _ = model.apply(
                        params, ids_i[:, ::-1], prosody=prosody_i,
                        use_memory=use_memory,
                        memory_state=memory_state if cfg.use_rag else None,
                        rngs={"dropout": rng_i})
                    loss = loss + 0.5 * hippocampal_loss(
                        out_r.logits[:, :-1], labels_i[:, ::-1][:, 1:], None,
                        label_smoothing=tcfg.label_smoothing,
                        entropy_lambda=tcfg.entropy_lambda,
                        sparsity_lambda=0.0)
                return loss, (ce, out)

            accum = max(1, tcfg.gradient_accumulation_steps)
            if accum > 1:
                # micro-batch gradient accumulation: lax.scan over
                # [A, B/A, ...] slices of ids, LABELS, and PROSODY together
                # (the labels/prosody must track their micro-batch — scoring
                # logits against the inputs or reusing micro-batch 0's
                # prosody silently trains the wrong objective).
                B_full, L = input_ids.shape
                mb = B_full // accum
                ids_mb = input_ids[:mb * accum].reshape(accum, mb, L)
                labels_mb = labels[:mb * accum].reshape(accum, mb, L)
                if prosody is not None:
                    pros_mb = prosody[:mb * accum].reshape(
                        accum, mb, L, prosody.shape[-1])
                else:
                    pros_mb = jnp.zeros((accum, mb, L, 4))
                rngs_mb = jax.random.split(dropout_rng, accum)
                zero_g = jax.tree.map(
                    lambda p: jnp.zeros_like(p, jnp.float32), state.params)

                def micro(carry, xs):
                    g_acc, loss_acc, ce_acc = carry
                    ids_i, labels_i, pros_i, rng_i = xs
                    pros_arg = pros_i if prosody is not None else None
                    (l, (c, out_i)), g = jax.value_and_grad(
                        batch_loss, has_aux=True)(
                            state.params, ids_i, labels_i, pros_arg, rng_i)
                    g_acc = jax.tree.map(
                        lambda a, b: a + b.astype(jnp.float32), g_acc, g)
                    return (g_acc, loss_acc + l, ce_acc + c), \
                        out_i.memory_summary

                (g_sum, loss_sum, ce_sum), summaries = jax.lax.scan(
                    micro, (zero_g, jnp.zeros(()), jnp.zeros(())),
                    (ids_mb, labels_mb, pros_mb, rngs_mb))
                grads = jax.tree.map(lambda g: g / accum, g_sum)
                loss = loss_sum / accum
                ce = ce_sum / accum
                if ewc.fisher is not None:
                    p_loss, p_grads = jax.value_and_grad(ewc.penalty)(
                        state.params)
                    loss = loss + p_loss
                    grads = jax.tree.map(
                        lambda a, b: a + b.astype(a.dtype), grads, p_grads)
                memory_summary = summaries.reshape(-1, summaries.shape[-1])
            else:
                def loss_fn(params):
                    loss, aux = batch_loss(params, input_ids, labels,
                                           prosody, dropout_rng)
                    if ewc.fisher is not None:
                        loss = loss + ewc.penalty(params)
                    return loss, aux

                (loss, (ce, out)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                memory_summary = out.memory_summary

            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            updates = jax.tree.map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(state.params, updates)

            # numerical-health guard (SURVEY §5.2/§5.3: the reference's NaN
            # probes + OOM catches): a non-finite loss skips the update
            # entirely instead of corrupting params/optimizer state
            finite = jnp.isfinite(loss)
            params = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old),
                params, state.params)
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old)
                if hasattr(new, "shape") else new,
                opt_state, state.opt_state)

            if store_memory is not False:          # True or "traced"
                B = memory_summary.shape[0]
                locs = jnp.zeros((B, mcfg.spatial_dims))

                def do_write(ms):
                    if memory_mesh is not None:
                        from aura_snn_rag_tpu.memory.sharded import (
                            write_memories_sharded)
                        return write_memories_sharded(
                            mcfg, memory_mesh, ms, memory_summary, locs,
                            axis=getattr(self, "_batch_axes", ("data",)))
                    return memory_engine.write_memories(
                        mcfg, ms, memory_summary, locs)

                if store_memory == "traced":
                    memory_state = jax.lax.cond(
                        store_flag, do_write, lambda ms: ms, memory_state)
                else:
                    memory_state = do_write(memory_state)
            memory_state = memory_engine.tick(memory_state, 1.0)

            new_state = TrainState(params, opt_state, state.step + 1)
            # pack scalars into ONE array: each device->host fetch costs a
            # full tunnel roundtrip (~30 ms); one packed fetch, not three
            metrics = jnp.stack([loss.astype(jnp.float32),
                                 ce.astype(jnp.float32),
                                 thalamus_scale.astype(jnp.float32)])
            return new_state, memory_state, metrics

        return jax.jit(step_fn, donate_argnums=(0, 1))

    def _get_step_fn(self, use_memory, store_memory, reverse_replay=False):
        key = (use_memory, store_memory, reverse_replay)
        if key not in self._step_fns:
            self._step_fns[key] = self._build_step(*key)
        return self._step_fns[key]

    def _build_chunk(self, use_memory: bool):
        """N train steps in ONE dispatch: lax.scan over the step body.

        Amortizes the per-dispatch host↔device roundtrip (tens of ms on
        tunneled backends). Episodic stores follow a per-step mask
        (lax.cond between the store/no-store step variants); modulator
        scalars are fixed for the chunk.
        """
        # ONE step body with a traced store flag (lax.cond wraps only the
        # episodic write) — compiling two full step variants doubled the
        # chunk graph and blew HBM at flagship scale
        step = self._build_step(use_memory, "traced", False)

        def chunk_fn(state, memory_state, ids, labels, store_mask,
                     lr_scale, rngs, amygdala_params, thalamus_params):
            def body(carry, xs):
                st, mem = carry
                ids_i, labels_i, store_i, rng_i = xs
                st, mem, m = step(st, mem, ids_i, labels_i, lr_scale,
                                  rng_i, amygdala_params, thalamus_params,
                                  store_i)
                return (st, mem), m

            (state, memory_state), metrics = jax.lax.scan(
                body, (state, memory_state),
                (ids, labels, store_mask, rngs))
            return state, memory_state, metrics          # metrics [N, 3]

        return jax.jit(chunk_fn, donate_argnums=(0, 1))

    def train_chunk(self, input_ids, labels) -> Dict[str, float]:
        """Run a [N, B, L] chunk of steps in one device dispatch.

        use_memory is decided once per chunk from the current gates;
        stores follow `memory_store_interval` within the chunk. Returns
        the last step's metrics (full per-step losses in `history`).
        """
        tcfg = self.config.training
        input_ids = np.asarray(input_ids)
        N = input_ids.shape[0]
        start = int(self.state.step)

        base_on = start >= tcfg.memory_warmup_steps
        use_memory = bool(
            base_on and self._modulator_gate_on())
        store_mask = np.asarray(
            [use_memory and ((start + i) % tcfg.memory_store_interval == 0)
             for i in range(N)])

        key = ("chunk", use_memory)
        if key not in self._step_fns:
            self._step_fns[key] = self._build_chunk(use_memory)
        fn = self._step_fns[key]

        self.rng, sub = jax.random.split(self.rng)
        rngs = jax.random.split(sub, N)
        lr_scale = jnp.asarray(
            EndocrineSystem.lr_scale(self._last_hormones())
            if self.endocrine else 1.0, jnp.float32)

        self.state, self.hippocampus.state, metrics = fn(
            self.state, self.hippocampus.state,
            self._place_batch(input_ids), self._place_batch(labels),
            jnp.asarray(store_mask), lr_scale, rngs,
            self.amygdala_params, self.thalamus_params)

        fetched = np.asarray(metrics)                     # one roundtrip
        for i in range(N):
            self.history["loss"].append(float(fetched[i, 0]))
            self.history["step"].append(start + i)
        loss = float(fetched[-1, 0])
        self._thalamus_scale = float(fetched[-1, 2])
        if self.endocrine is not None:
            levels = self.endocrine.step({
                "accuracy": max(0.0, min(1.0, float(np.exp(-loss)))),
                "gate_diversity": 0.5, "energy": 0.1})
            self._hormones = levels
            self._memory_gate_scale = EndocrineSystem.memory_gate(levels)
        for i in range(N):
            self.replay.add(input_ids[i], np.asarray(labels)[i],
                            float(fetched[i, 0]))

        # per-step hooks the chunk crossed (train_step parity): periodic
        # memory decay (colab_l4_training.py:686-691), sleep-phase replay,
        # and telemetry commits — run once per boundary crossed
        end = start + N
        if (end // tcfg.eval_steps) > (start // tcfg.eval_steps):
            self.hippocampus.decay_memories(tcfg.memory_decay_rate)
        if ((end // tcfg.sleep_interval) > (start // tcfg.sleep_interval)
                and len(self.replay) > 0):
            self.sleep_phase()
        if (end // tcfg.logging_steps) > (start // tcfg.logging_steps):
            self.stats.update_from_params(self.state.params)
            self.stats.classify_stability(self.history["loss"][-20:])
            self.stats.update_loss(loss)
            snapshot = self.stats.commit(end)
            self.event_bus.emit(
                "brain_stats_updated", source="trainer",
                step=end, loss=loss, stability=snapshot.stability)

        return {"loss": loss, "ce": float(fetched[-1, 1]),
                "use_memory": use_memory, "step": start + N - 1}

    # ------------------------------------------------------------------
    # public stepping API
    # ------------------------------------------------------------------
    def train_step(self, input_ids, labels) -> Dict[str, float]:
        """One wake step with full modulator coupling."""
        tcfg = self.config.training
        step = int(self.state.step)

        base_on = step >= tcfg.memory_warmup_steps
        use_memory = bool(
            base_on and self._modulator_gate_on())
        store_memory = bool(use_memory
                            and step % tcfg.memory_store_interval == 0)

        self.rng, sub = jax.random.split(self.rng)
        lr_scale = jnp.asarray(
            EndocrineSystem.lr_scale(self._last_hormones())
            if self.endocrine else 1.0, jnp.float32)

        fn = self._get_step_fn(use_memory, store_memory)
        self.state, self.hippocampus.state, metrics = fn(
            self.state, self.hippocampus.state,
            self._place_batch(input_ids), self._place_batch(labels), lr_scale, sub,
            self.amygdala_params, self.thalamus_params)

        # fetch the PREVIOUS step's scalars while this step executes —
        # a blocking device→host read costs ~30 ms on tunneled backends,
        # so modulators consume 1-step-lagged values (same lag the
        # thalamus gate already has)
        pending = getattr(self, "_pending_metrics", None)
        self._pending_metrics = metrics
        fi = max(1, tcfg.metrics_fetch_interval)
        if pending is None or step % fi == 0 or not hasattr(self, "_last_fetched"):
            fetched = np.asarray(pending if pending is not None else metrics)
            self._last_fetched = fetched
        loss, ce, self._thalamus_scale = (float(self._last_fetched[0]),
                                          float(self._last_fetched[1]),
                                          float(self._last_fetched[2]))
        if self.endocrine is not None:
            levels = self.endocrine.step({
                "accuracy": max(0.0, min(1.0, float(np.exp(-loss)))),
                "gate_diversity": 0.5,
                "energy": 0.1,
            })
            self._hormones = levels
            self._memory_gate_scale = EndocrineSystem.memory_gate(levels)

        self.replay.add(np.asarray(input_ids), np.asarray(labels), loss)
        self.history["loss"].append(loss)
        self.history["step"].append(step)

        # telemetry commit every logging interval
        if step > 0 and step % tcfg.logging_steps == 0:
            self.stats.update_from_params(self.state.params)
            self.stats.classify_stability(self.history["loss"][-20:])
            snapshot = self.stats.commit(step)
            self.event_bus.emit(
                "brain_stats_updated", source="trainer",
                step=step, loss=loss, stability=snapshot.stability)

        # periodic decay (colab_l4_training.py:686-691)
        if step > 0 and step % tcfg.eval_steps == 0:
            self.hippocampus.decay_memories(tcfg.memory_decay_rate)

        # sleep phase
        if (step > 0 and step % tcfg.sleep_interval == 0
                and len(self.replay) > 0):
            self.sleep_phase()

        return {"loss": loss, "ce": ce,
                "use_memory": use_memory, "step": step}

    def sleep_phase(self):
        """Replay + time-reversed replay consolidation
        (hippocampal_trainer.py:327-348)."""
        tcfg = self.config.training
        for input_ids, labels, _ in self.replay.sample(
                tcfg.sleep_replay_batches, self._np_rng):
            self.rng, sub = jax.random.split(self.rng)
            fn = self._get_step_fn(False, False, reverse_replay=True)
            self.state, self.hippocampus.state, _ = fn(
                self.state, self.hippocampus.state,
                self._place_batch(input_ids), self._place_batch(labels),
                jnp.ones(()), sub, self.amygdala_params,
                self.thalamus_params)

    def consolidate_ewc(self, val_batches, use_memory: Optional[bool] = None):
        """Compute Fisher on validation batches and anchor current params.

        Fisher must be computed on the SAME effective model being
        consolidated (VERDICT r1 weak #8): when episodic memory currently
        conditions training, it conditions the Fisher too. Default matches
        the trainer's live memory gate; pass use_memory explicitly to
        override.
        """
        model = self.eval_model
        cfg = self.config.model
        tcfg = self.config.training
        if use_memory is None:
            base_on = int(self.state.step) >= tcfg.memory_warmup_steps
            use_memory = bool(
                base_on and cfg.use_rag
                and self._modulator_gate_on())
        memory_state = self.hippocampus.state if cfg.use_rag else None

        @jax.jit
        def grad_fn(params, batch):
            input_ids, labels = batch

            def lf(p):
                out, _ = model.apply(p, input_ids, use_memory=use_memory,
                                     memory_state=memory_state)
                return hippocampal_loss(out.logits[:, :-1], labels[:, 1:],
                                        entropy_lambda=0.0,
                                        label_smoothing=0.0)
            return jax.grad(lf)(params)

        self.ewc.consolidate(grad_fn, self.state.params, val_batches)
        # step functions capture self.ewc.fisher at trace time → rebuild
        self._step_fns.clear()

    def _modulator_gate_on(self) -> bool:
        """Endocrine/thalamic memory veto (colab_l4_training.py:599-600).

        With endocrine_memory_gating=False the hormone gate keeps scaling
        the LR but cannot veto memory (long-run accuracy=exp(-loss)
        saturates low and would shut memory off permanently).
        """
        gate = (self._memory_gate_scale
                if self.config.training.endocrine_memory_gating else 1.0)
        return gate * self._thalamus_scale >= 0.9

    def _last_hormones(self):
        return getattr(self, "_hormones", {})

    def eval_loss(self, input_ids, labels) -> float:
        if not hasattr(self, "_eval_fn"):
            model = self.eval_model

            @jax.jit
            def _eval(params, ids, lbls):
                out, _ = model.apply(params, ids, use_memory=False)
                return hippocampal_loss(
                    out.logits[:, :-1], lbls[:, 1:],
                    entropy_lambda=0.0, label_smoothing=0.0)

            self._eval_fn = _eval
        return float(self._eval_fn(self.state.params,
                                   jnp.asarray(input_ids),
                                   jnp.asarray(labels)))
