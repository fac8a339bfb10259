"""Feature encoders & ingestion pipelines (SURVEY.md §2.5)."""

from aura_snn_rag_tpu.encoders.hash_embedder import FastHashEmbedder  # noqa: F401
from aura_snn_rag_tpu.encoders.embedding_cache import EmbeddingCache  # noqa: F401
