"""Model stack: hippocampal transformer LM and its building blocks."""

from aura_snn_rag_tpu.models.transformer import (  # noqa: F401
    HippocampalTransformer,
    TransformerOutput,
)
from aura_snn_rag_tpu.models.layers import (  # noqa: F401
    PlaceCellEncoder,
    ProsodyGatedAttention,
    TransformerLayer,
    MLP,
    SNNFFN,
    HybridFFN,
)
