"""Services: continuous-learning ingestion and the brain system facade."""

from aura_snn_rag_tpu.services.continuous_learning import (  # noqa: F401
    ContinuousLearningOrchestrator,
    FeedConfig,
    create_default_feeds,
)
