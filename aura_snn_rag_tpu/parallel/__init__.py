"""Device mesh + sharding (no reference equivalent — SURVEY.md §2.8).

The reference is single-device; this package supplies the TPU-native scale
path: a ('data', 'model') mesh, NamedSharding param rules (tensor parallel
over heads/FFN-hidden, data parallel over batch and memory-bank rows), and
GSPMD-compiled collectives over ICI.
"""

from aura_snn_rag_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_params,
    shard_batch,
    param_sharding_rules,
)
