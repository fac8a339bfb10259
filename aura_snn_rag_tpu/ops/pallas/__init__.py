"""Pallas TPU kernels for the hot memory-engine ops."""

from aura_snn_rag_tpu.ops.pallas.ivf_scan import (  # noqa: F401
    ivf_scan_scores, pallas_available,
)
