"""Core compute ops: surrogate gradients, spiking neurons, encodings."""

from aura_snn_rag_tpu.ops.surrogate import (  # noqa: F401
    multi_bit_spike,
    heaviside_spike,
)
from aura_snn_rag_tpu.ops.neurons import (  # noqa: F401
    LIFParams,
    lif_scan,
    izhikevich_scan,
    adex_scan,
    gif_scan,
    gif_scan_const,
    GIFParams,
    IzhikevichParams,
    AdExParams,
)
from aura_snn_rag_tpu.ops.theta_gamma import theta_gamma_encoding  # noqa: F401
from aura_snn_rag_tpu.ops.place_cells import sparse_place_code  # noqa: F401
