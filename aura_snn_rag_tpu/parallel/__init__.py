"""Device mesh + sharding (no reference equivalent — SURVEY.md §2.8).

The reference is single-device; this package supplies the TPU-native scale
path: a ('data', 'model') mesh, NamedSharding param rules (tensor parallel
over heads/FFN-hidden, data parallel over batch and memory-bank rows),
GSPMD-compiled collectives over ICI, a multi-slice ('replica','data',
'model') hybrid mesh whose 'replica' collectives ride DCN, a GPipe-style
microbatch pipeline over a 'stage' axis, ring attention over a 'seq' axis
(sequence/context parallelism), and the multi-host launcher seam.
"""

from aura_snn_rag_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_params,
    shard_batch,
    param_sharding_rules,
)
from aura_snn_rag_tpu.parallel.distributed import (  # noqa: F401
    global_mesh,
    initialize,
    local_batch_slice,
    make_global_array,
    multislice_mesh,
)
from aura_snn_rag_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_apply,
    split_microbatches,
    stack_stage_params,
)
from aura_snn_rag_tpu.parallel.ring_attention import (  # noqa: F401
    ring_attention,
    sequence_sharded_attention,
)
