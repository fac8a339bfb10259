"""Brain orchestration & modulators (SURVEY.md §2.3).

- Amygdala / LimbicSystem      ↔ limbic_system.py:15-87
- EndocrineSystem              ↔ endocrine.py:56-124 (host-side controller)
- LiquidCell / LiquidMoERouter ↔ liquid_moe.py:16-97
- Thalamus                     ↔ thalamus.py:16-100
- BasalGanglia                 ↔ basal_ganglia.py:12-57
"""

from aura_snn_rag_tpu.models.brain.amygdala import Amygdala, build_prosody  # noqa: F401
from aura_snn_rag_tpu.models.brain.endocrine import (  # noqa: F401
    EndocrineSystem, HormoneType,
)
from aura_snn_rag_tpu.models.brain.liquid_moe import (  # noqa: F401
    LiquidCell, LiquidMoERouter, BanditGating,
)
from aura_snn_rag_tpu.models.brain.thalamus import Thalamus  # noqa: F401
from aura_snn_rag_tpu.models.brain.basal_ganglia import BasalGanglia  # noqa: F401
