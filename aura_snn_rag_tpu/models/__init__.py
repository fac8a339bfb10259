"""Model stack: hippocampal transformer LM and its building blocks."""

from aura_snn_rag_tpu.models.transformer import (  # noqa: F401
    HippocampalTransformer,
    TransformerOutput,
)
from aura_snn_rag_tpu.models.layers import (  # noqa: F401
    PlaceCellEncoder,
    ProsodyGatedAttention,
    TransformerLayer,
    MemoryAugmentedLayer,
    Synapsis,
    MLP,
    SNNFFN,
    HybridFFN,
)
from aura_snn_rag_tpu.models.snn_rag import (  # noqa: F401
    SNNRAGTransformer,
    snn_rag_config,
)
from aura_snn_rag_tpu.models.language_zone import (  # noqa: F401
    FullLanguageZone,
    MoELanguageZone,
    SNNExpert,
)
