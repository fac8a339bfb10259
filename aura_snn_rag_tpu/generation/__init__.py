"""Generation service: KV-cached incremental decode + sampling transforms."""

from aura_snn_rag_tpu.generation.sampler import (  # noqa: F401
    apply_repetition_penalty,
    top_k_filter,
    top_p_filter,
    sample_token,
    generate,
)
