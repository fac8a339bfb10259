"""LR schedule: linear warmup + cosine decay to min_lr_ratio.

Parity with the reference's scheduler (hippocampal_trainer.py:19-41).
"""

from __future__ import annotations

import optax


def warmup_cosine_schedule(lr: float, warmup_steps: int, max_steps: int,
                           min_lr_ratio: float = 0.1):
    max_steps = max(2, max_steps)
    # decay_steps is TOTAL steps incl. warmup; keep warmup strictly inside
    warmup_steps = min(max(1, warmup_steps), max_steps - 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=warmup_steps,
        decay_steps=max_steps,
        end_value=lr * min_lr_ratio,
    )
