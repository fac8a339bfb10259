"""Configuration dataclasses and named presets.

Mirrors the reference's dataclass-preset pattern
(`/root/reference/src/training/config.py:12-153`,
`/root/reference/colab_l4_training.py:56-180`) with an added mesh/sharding
section that the single-device reference has no equivalent of (SURVEY.md §2.8).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class MemoryConfig:
    """Episodic memory engine (hippocampal formation) configuration.

    Knob parity with `/root/reference/src/core/hippocampal.py:41-118`:
    max_memories=100_000, feature_dim=768, k_centroids=256, rebuild every
    512 inserts, probe 8 centroids, retrieve k=5. The TPU build replaces
    wall-clock timestamps with a logical step clock (`seconds_per_step`
    converts steps back to the reference's exp(-age/3600) temporal decay).
    """

    max_memories: int = 100_000
    feature_dim: int = 768
    spatial_dims: int = 2
    k_centroids: int = 256
    rebuild_interval: int = 512          # rebuild centroids every N inserts
    probe_centroids: int = 8             # nearest centroids scanned per query
    retrieve_k: int = 5
    # coarse→rerank funnel width: the bf16 clustered scan keeps this many
    # candidates per query for the exact f32 rerank (near-tie scores below
    # bf16 resolution need a wide funnel)
    rerank_candidates: int = 128
    # approx_max_k recall target in the IVF funnel. The IVF candidate row is
    # only probe×capacity (~32-64k) wide, so the hardware top-k's recall
    # slack binds there (0.95 measured ≈ 0.96 end-to-end recall@10); 0.99
    # restores ≥0.99 recall for ~zero cost at that row width. The flat path
    # keeps 0.95: its funnel spans the full bank and the slack is absorbed.
    ivf_funnel_recall: float = 0.99
    # Bucketed IVF layout: per-centroid candidate list capacity. Static shape
    # requirement on TPU; capacity = overprovision * max_memories/k_centroids.
    bucket_overprovision: float = 2.0
    # Scoring weights: (cosine, spatial, temporal) — hippocampal.py:300-303.
    w_cosine: float = 0.5
    w_spatial: float = 0.3
    w_temporal: float = 0.2
    temporal_tau: float = 3600.0         # exp(-age/tau), hippocampal.py:297
    seconds_per_step: float = 1.0        # logical-clock → seconds conversion
    # Cognitive map (place/grid/time cells) — hippocampal.py:55-82.
    n_place_cells: int = 2000
    n_grid_cells: int = 200
    n_time_cells: int = 100
    place_max_rate: float = 20.0
    grid_max_rate: float = 25.0
    # Lloyd iterations in a full rebuild (reference uses 1: hippocampal.py:357).
    rebuild_lloyd_iters: int = 1
    # Capacity-overflow spill rounds: rows overflowing a full bucket move to
    # their next-nearest centroid, iteratively (cuckoo-style). Each round
    # shrinks residual drops geometrically; rows still overflowing after the
    # last round land in the reserved overflow annex (below), or — if that
    # is full too — are reachable only by the flat/brute paths.
    spill_rounds: int = 8
    # Reserved overflow annex: the LAST min(overflow_buckets, K//4) clusters
    # are excluded from k-means (sentinel centroids, never probed) and hold
    # rows that still overflow after all spill rounds. Queries score the
    # annex with one contiguous [G·C, D] matmul merged into the funnel, so
    # dense-region capacity drops cost ~zero recall instead of ~2-3% @1M
    # (measured: 33k/1M rows dropped at overprovision 2.0, spill 3; with a
    # 64-bucket annex: 0 drops, recall@10 = 1.0000 on every kernel).
    # Size for big banks: annex capacity G*C should cover ~3-4% of M
    # (G ≈ ceil(0.04*M/C)); G is silently capped at K//4.
    overflow_buckets: int = 16
    # fused Pallas gather+score kernel for the IVF path (TPU backends only)
    use_pallas_ivf: bool = True
    # IVF kernel generation: "v2" = per-probe in-kernel top-k + XLA funnel,
    # "v3" = cross-probe exact top-kk finished in-kernel, "v3r" = exact f32
    # rerank + final top-k fused too (XLA does only the output gather).
    # Measured on v5e @1M×768 (32-rep pipelined device time, probe=64):
    # B=1 v3r 1.01 ms / v2 1.13 / v3 1.28; B=8 v3 2.08 / v3r 2.18 / v2 3.02.
    ivf_kernel: str = "v3r"
    # Coarse-scan precision for the FLAT path's bank copy: "bf16" (default)
    # or "int8" (symmetric 127-scale quantization of the L2-normalized
    # rows). The flat scan is HBM-bandwidth-bound at 1M vectors, so int8
    # halves the bank read AND doubles the MXU rate; the ~0.3% quantized
    # score error is absorbed by the exact f32 rerank funnel exactly like
    # bf16's rounding is. The IVF clustered store stays bf16.
    coarse_dtype: str = "bf16"
    # Score-chain dtype for the FLAT path's [B, M] intermediates (cosine,
    # combined score, mask): "f32" (default) or "bf16". At 1M rows the f32
    # chain writes+rereads ~0.5 GB per 128-query batch on top of the bank
    # read; bf16 halves that HBM traffic. Funnel-only precision — the
    # exact f32 rerank restores exactness on the survivors.
    # (Only used by flat_strategy="scan".)
    flat_score_dtype: str = "f32"
    # approx_max_k recall target for the flat scan's coarse funnel (the
    # exact f32 rerank restores exactness on the survivors, so end recall
    # is governed by funnel width x this). Raise toward 0.99 with int8
    # coarse banks where quantization near-ties push true top-k items
    # deeper into the coarse ordering. (Only used by flat_strategy="scan".)
    flat_funnel_recall: float = 0.95
    # Flat-scan strategy: "blockmax" streams the bank once through the
    # Pallas block-max kernel (no [B, M] materialization, hierarchical
    # EXACT funnel selection — see ops/pallas/flat_scan.py); "scan" is the
    # [B, M] + approx_max_k XLA path. Default "scan": it holds the B=1024
    # serving-batch headline (56.2k QPS @1M×768, runs/
    # bench_headline_defaults.out). The reworked kernel wins the ISOLATED
    # coarse stage at B=128 (s8-native tile=2048 4.60 ms vs XLA 6.30 ms,
    # runs/flat_kernel_ab_v2.out) and is the coarse engine of the
    # host-spilled bank (memory/host_spill.py), where a [B, M]
    # materialization cannot exist at 10M rows.
    flat_strategy: str = "scan"
    # Number of 8-row blocks whose members get the exact f32 rerank in the
    # blockmax path (funnel width = 8x this). 64 blocks = 512 reranked
    # rows, provably containing the coarse top-k for any k <= 64.
    flat_block_funnel: int = 64
    # Bank rows per blockmax-kernel grid step. Larger tiles amortize the
    # per-grid-step overhead (DMA setup + semaphores) over more bank rows;
    # must be a multiple of 32 and of the 8-row funnel block.
    flat_tile_m: int = 1024
    # Near-tie rescue pass (flat scan only): after the exact rerank, the
    # `flat_rescue_queries` queries in the batch with the smallest margin
    # between their k-th exact score and their coarse funnel cutoff get a
    # second, `flat_rescue_width`-wide funnel drawn from the SAME [B, M]
    # coarse scores (no second bank read), exact-reranked and union-merged
    # (with dedup) into the narrow result. Default OFF: the clean chip A/B
    # (runs/rescue_ab_1m.out) measured it recall-neutral at -47% QPS —
    # the headline's ~0.35% misses are approx_max_k funnel slack (random
    # drops, uncorrelated with the coarse margin), NOT quantized
    # near-ties, so margin-ranked rescue targets the wrong queries and
    # keeping the [B, M] coarse matrix alive for the second pass defeats
    # XLA's fusion of it into the funnel. The slack itself is closed
    # exactly by `flat_exact_funnel` below.
    flat_rescue_queries: int = 0
    flat_rescue_width: int = 1024
    # Exact coarse funnel (flat scan): replace the approx_max_k funnel
    # with the PROVABLE block-max hierarchy (select_block_candidates —
    # the coarse top-j rows live in the top-j blocks by block max, so
    # expanding the top `flat_block_funnel` blocks and exact-top-k-ing
    # their coarse scores yields the EXACT coarse top-rerank_candidates;
    # zero funnel slack). Residual recall loss is then only int8/bf16
    # rank inflation beyond the funnel width. Measured on chip
    # (runs/funnel_ab_1m.out): recall 0.99883/0.99961/1.000 at kk
    # 128/192/256 — but 14.1k/10.0k/7.6k QPS (the hierarchy + structured
    # gather cost ~4x the approx funnel), so it serves as the recall
    # oracle, not the default.
    flat_exact_funnel: bool = False
    # Wide-then-exact funnel (flat scan): approx_max_k returns
    # `flat_wide_funnel` candidates (per-element drop probability for a
    # true top-10 item falls ~linearly in the width), and the exact
    # top-`rerank_candidates` of the returned VALUES — one cheap [B, wide]
    # sort, no extra gathers — feeds the f32 rerank. Closes approx slack
    # almost to the exact funnel's recall at a few percent of the cost.
    # 0 disables (plain kk-wide approx funnel).
    flat_wide_funnel: int = 0
    # Host-spilled bank second-stage funnel: the device re-scores the
    # block funnel's flat_block_funnel*8 candidate rows (one [B, F, D]
    # int8 gather at HBM speed) and returns only the top `spill_funnel_rows`
    # slots per query. Cuts device->host transfer AND the host f32 rerank
    # by F/spill_funnel_rows (~5.3x at the 512->96 defaults) — the two
    # serial stages that bound the 10M tier. The round-5 on-chip sweep at
    # 10M x 768 / B=1024 (runs/hs_r5_sweep.out) measured recall@10 = 1.000
    # at every width down to 64 (per-query max-abs int8 scale keeps true
    # top-10 rows high in the exact-coarse order); 96 = 2216 QPS with a
    # 2x cushion over the also-recall-perfect 64 (2530 QPS). 0, or a
    # value >= the block funnel width, disables the second stage
    # (single-stage block funnel).
    spill_funnel_rows: int = 96
    # Host-spilled bank query chunking: the device funnel runs queries in
    # chunks of this size (lax.map). Bounds the [chunk, M/8] f32 block-max
    # surface — at B=1024 x 10M rows the unchunked surface was 4.77 GB
    # PLUS an equal-size relayout copy next to the 7.2 GB coarse bank
    # (compile-time HBM OOM, runs/hs_r4_b1024.errlog). 256 keeps the temp
    # at 1.2 GB for 10M rows; the extra bank reads (~10 ms each) are noise
    # next to the transfer+rerank stages the big batch amortizes. Must be
    # a multiple of 128 (kernel batch alignment); 0 disables chunking.
    spill_query_chunk: int = 256

    @property
    def bucket_capacity(self) -> int:
        cap = int(self.bucket_overprovision * self.max_memories / self.k_centroids)
        # Keep lane-aligned for TPU friendliness.
        return max(8, ((cap + 127) // 128) * 128)


@dataclass(frozen=True)
class ModelConfig:
    """Hippocampal transformer model configuration.

    Parity: `/root/reference/src/training/config.py:12-37`.
    """

    vocab_size: int = 32_000
    embedding_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_seq_len: int = 512
    dropout: float = 0.1

    # Place-cell encoder (place_cell_encoder.py:12-137)
    n_place_cells: int = 2000
    place_cell_sparsity: float = 0.03
    place_residual_scale: float = 0.1

    # Theta-gamma positional encoding (theta_gamma_encoding.py:12-106)
    theta_freq: float = 8.0
    gamma_freq: float = 40.0

    # Memory-augmented (RAG) layers (memory_augmented_layer.py:18-251)
    use_rag: bool = False
    memory_injection: str = "gate"       # "gate" | "cross_attention" | "concat"
    num_retrieved: int = 5

    # Spiking FFN (snn_ffn.py:16-146). `snn_layers` lists layer indices using
    # a HybridFFN; empty tuple = standard GELU MLP everywhere.
    snn_layers: Tuple[int, ...] = ()
    snn_timesteps: int = 4
    snn_levels: int = 8                  # multi-bit spike levels L
    snn_ratio: float = 0.5

    use_gradient_checkpointing: bool = False
    # remat policy: "full" recomputes the whole layer on backward (lowest
    # memory, +~33% FLOPs); "dots" saves matmul/attention outputs and only
    # recomputes elementwise work (GIF dynamics, gates, norms) — much less
    # recompute for a modest activation-memory increase.
    gradient_checkpoint_policy: str = "full"
    tie_word_embeddings: bool = True
    dtype: str = "bfloat16"              # computation dtype

    @property
    def head_dim(self) -> int:
        return self.embedding_dim // self.num_heads

    @property
    def place_k(self) -> int:
        return max(1, int(self.n_place_cells * self.place_cell_sparsity))


@dataclass(frozen=True)
class TrainingConfig:
    """Training hyperparameters. Parity: training/config.py:40-90."""

    batch_size: int = 32
    gradient_accumulation_steps: int = 1
    max_steps: int = 100_000

    lr: float = 1e-4
    warmup_steps: int = 2000
    min_lr_ratio: float = 0.1
    weight_decay: float = 0.01
    gradient_clip: float = 1.0
    # AdamW first-moment dtype: "bfloat16" halves that optimizer buffer
    # (~0.9 GB at flagship scale) with negligible effect on convergence;
    # the second moment stays f32 (it spans orders of magnitude).
    optimizer_mu_dtype: str = "float32"

    label_smoothing: float = 0.1
    entropy_lambda: float = 0.05
    sparsity_lambda: float = 0.02
    target_sparsity: float = 0.03

    # Memory system
    memory_warmup_steps: int = 5000
    memory_store_interval: int = 10      # store memories every N steps
    memory_decay_rate: float = 0.001
    replay_buffer_size: int = 50_000
    ewc_lambda: float = 0.4

    # Sleep-wake cycle (hippocampal_trainer.py:192-196)
    sleep_interval: int = 1000
    sleep_replay_batches: int = 4

    save_steps: int = 1000
    eval_steps: int = 500
    logging_steps: int = 100
    # fetch step metrics from device every N steps (1 = reference parity;
    # higher values amortize the ~30 ms tunnel roundtrip — modulators then
    # run on N-step-stale losses)
    metrics_fetch_interval: int = 1

    # Modulators (colab_l4_training.py:827-829, :648-667)
    enable_amygdala: bool = True
    enable_endocrine: bool = True
    enable_thalamus: bool = True
    # Let the endocrine memory gate (×[0.8,1.2], reference
    # colab_l4_training.py:662-667) veto episodic memory when it drops the
    # use_memory product below 0.9. The reference maps accuracy=exp(-loss),
    # which saturates near 0 at any converged LM loss, so on long runs the
    # hormone EMAs drift until the gate shuts memory off permanently —
    # fine for the reference's short demos, wrong for unattended flagship
    # runs. False keeps hormone-driven LR scaling but not the memory veto
    # (same rationale as enable_thalamus=False for unattended runs).
    endocrine_memory_gating: bool = True

    seed: int = 42


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh / sharding configuration (no reference equivalent; SURVEY §2.8).

    Axes: 'data' (batch + memory-bank rows), 'model' (attention heads / FFN
    hidden / vocab). Collectives ride ICI via GSPMD.
    """

    data_axis: int = -1                  # -1 = all remaining devices
    model_axis: int = 1
    axis_names: Tuple[str, str] = ("data", "model")


@dataclass(frozen=True)
class ParallelConfig:
    """Parallelism strategy selection (no reference equivalent; SURVEY §2.8).

    DP/TP are implicit in the mesh shape ('data'/'model' axis sizes); the
    two strategies that change the PROGRAM — sequence sharding (ring
    attention) and pipeline stages (GPipe ring) — are selected here so the
    flagship model can train sequence-sharded or staged straight from
    `AuraConfig` instead of by hand-wiring the primitives.

    - seq_shards > 1: `Trainer.shard_to_mesh` expects a mesh with a 'seq'
      axis of that size, shards every [B, L] batch over (batch_axes, 'seq'),
      and `ProsodyGatedAttention` routes its causal core through
      `parallel.ring_attention` (exact blockwise softmax, K/V blocks
      rotating one ICI hop per step). All other ops shard along L via
      GSPMD. Requires max_seq_len % seq_shards == 0.
    - pp_stages > 1: the layer stack runs as a GPipe microbatch ring over a
      'stage' mesh axis via `models.pipelined.pipelined_lm_apply` /
      `pipelined_rag_apply` (per-stage params sharded where their stage
      lives). Requires num_layers % pp_stages == 0 and a uniform SNN-FFN
      pattern across stages.
    """

    seq_shards: int = 1
    seq_axis_name: str = "seq"
    pp_stages: int = 1
    pp_microbatches: int = 4
    stage_axis_name: str = "stage"


@dataclass(frozen=True)
class AuraConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    memory: MemoryConfig = field(default_factory=MemoryConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def replace(self, **kw) -> "AuraConfig":
        return dataclasses.replace(self, **kw)


def _cfg(model_kw, memory_kw, training_kw) -> AuraConfig:
    return AuraConfig(
        model=ModelConfig(**model_kw),
        memory=MemoryConfig(**memory_kw),
        training=TrainingConfig(**training_kw),
    )


def get_test_config() -> AuraConfig:
    """Small config for fast runs / CI (reference 'test' preset:
    colab_l4_training.py:133-151 — 512D/6L/8H, seq 256, 5k steps)."""
    return _cfg(
        dict(vocab_size=32_000, embedding_dim=512, num_layers=6, num_heads=8,
             intermediate_size=2048, max_seq_len=256, n_place_cells=1000),
        dict(max_memories=10_000, feature_dim=512, k_centroids=64,
             rebuild_interval=128, n_place_cells=1000),
        dict(batch_size=16, max_steps=5000, warmup_steps=200,
             memory_warmup_steps=500, sleep_interval=500),
    )


def get_debug_config() -> AuraConfig:
    """Tiny config for unit tests (reference get_debug_config)."""
    return _cfg(
        dict(vocab_size=512, embedding_dim=64, num_layers=2, num_heads=4,
             intermediate_size=128, max_seq_len=32, n_place_cells=128),
        dict(max_memories=256, feature_dim=64, k_centroids=8,
             rebuild_interval=32, n_place_cells=64, n_grid_cells=16,
             n_time_cells=8),
        dict(batch_size=4, max_steps=100, warmup_steps=10,
             memory_warmup_steps=10, sleep_interval=50),
    )


def get_small_config() -> AuraConfig:
    return _cfg(
        dict(embedding_dim=512, num_layers=6, num_heads=8,
             intermediate_size=2048, n_place_cells=1000),
        dict(feature_dim=512),
        dict(batch_size=16),
    )


def get_medium_config() -> AuraConfig:
    """12L/768D — the reference 'medium' preset (~160M class)."""
    return _cfg(dict(), dict(), dict(batch_size=32, max_steps=20_000))


def get_full_config() -> AuraConfig:
    """Flagship preset — the reference's production config exactly
    (colab_l4_training.py:165-180: 768D/12L/12H/3072, seq 512, SNN FFN on
    even layers, RAG on, 100k memories; MODEL_CARD.md:30 counts ~271M
    params including the hippocampal buffers)."""
    return _cfg(
        dict(embedding_dim=768, num_layers=12, num_heads=12,
             intermediate_size=3072, max_seq_len=512, n_place_cells=2000,
             use_rag=True, snn_layers=(0, 2, 4, 6, 8, 10)),
        dict(max_memories=100_000, feature_dim=768),
        # batch_size 16, not the reference's 32: measured one-chip (v5e
        # 16 GB) capacity is B=16 with remat + bf16 mu — B=32 OOMs even
        # with the "dots" checkpoint policy (docs/TRAINING.md "Memory
        # fitting"). Multi-chip runs scale batch via the mesh data axis
        # instead of the per-chip micro-batch.
        dict(batch_size=16, max_steps=50_000, warmup_steps=2000,
             memory_warmup_steps=5000),
    )


def get_xl_config() -> AuraConfig:
    """Beyond-reference scale (1024D/16L, ~410M trainable) — the TPU build
    headroom preset; no reference equivalent."""
    return _cfg(
        dict(embedding_dim=1024, num_layers=16, num_heads=16,
             intermediate_size=4096, n_place_cells=2000, use_rag=True,
             snn_layers=(2, 6, 10, 14)),
        dict(feature_dim=1024),
        dict(batch_size=64, max_steps=50_000),
    )
