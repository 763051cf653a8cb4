"""Optimizers (reference layer 5, SURVEY.md §2.7)."""

from mila_tpu.optim.adamw import AdamW, AdamWConfig, AdamWState, global_norm, zero_grads
from mila_tpu.optim.schedules import (
    Schedule,
    constant,
    step_decay,
    warmup_cosine,
    warmup_linear,
)
from mila_tpu.optim.sgd import SGD, SGDConfig, SGDState

__all__ = [
    "AdamW",
    "AdamWConfig",
    "AdamWState",
    "global_norm",
    "zero_grads",
    "Schedule",
    "constant",
    "step_decay",
    "warmup_cosine",
    "warmup_linear",
    "SGD",
    "SGDConfig",
    "SGDState",
]
