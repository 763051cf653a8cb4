"""Learning-rate schedules (jit-traceable step → lr functions).

The reference drives LR only via ``setLearningRate`` on the optimizer
(OptimizerBase.ixx); schedules here add the standard warmup/cosine/linear
decay needed by the GPT-2/Llama training parity path (llm.c-style loops the
GPT-2 sample sketches in Gpt2.cpp).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]  # step (int) → lr (f32)


def constant(lr: float) -> Schedule:
    return lambda step: jnp.float32(lr)


def warmup_cosine(
    peak_lr: float,
    warmup_steps: int,
    total_steps: int,
    final_lr: float = 0.0,
) -> Schedule:
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        warm = peak_lr * (s + 1.0) / max(warmup_steps, 1)
        progress = jnp.clip(
            (s - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = final_lr + 0.5 * (peak_lr - final_lr) * (1.0 + jnp.cos(math.pi * progress))
        return jnp.where(s < warmup_steps, warm, cos).astype(jnp.float32)

    return fn


def warmup_linear(
    peak_lr: float, warmup_steps: int, total_steps: int, final_lr: float = 0.0
) -> Schedule:
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        warm = peak_lr * (s + 1.0) / max(warmup_steps, 1)
        progress = jnp.clip(
            (s - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        lin = peak_lr + (final_lr - peak_lr) * progress
        return jnp.where(s < warmup_steps, warm, lin).astype(jnp.float32)

    return fn


def step_decay(lr: float, decay_rate: float, decay_every: int) -> Schedule:
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        return jnp.float32(lr) * decay_rate ** jnp.floor(s / decay_every)

    return fn
