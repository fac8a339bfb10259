"""Training subsystem: losses, schedules, trainer, replay, EWC, checkpoints."""

from aura_snn_rag_tpu.training.losses import hippocampal_loss  # noqa: F401
from aura_snn_rag_tpu.training.schedule import warmup_cosine_schedule  # noqa: F401
