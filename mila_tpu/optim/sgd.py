"""SGD (+momentum, nesterov) — companion optimizer to AdamW.

The reference ships only AdamW (§2.7); SGD is included for test oracles and
classic workloads, following the same functional init/step contract.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mila_tpu.utils.config import BaseConfig, ConfigError


@dataclasses.dataclass(frozen=True)
class SGDConfig(BaseConfig):
    learning_rate: float = 0.01
    momentum: float = 0.0
    nesterov: bool = False
    weight_decay: float = 0.0

    def validate(self):
        if self.learning_rate <= 0:
            raise ConfigError("learning_rate must be positive")
        if not 0 <= self.momentum < 1:
            raise ConfigError("momentum must be in [0,1)")


class SGDState(NamedTuple):
    step: jax.Array
    velocity: Any


class SGD:
    def __init__(self, config: Optional[SGDConfig] = None):
        self.config = config or SGDConfig()
        self.config.validate()

    def init(self, params) -> SGDState:
        vel = jax.tree_util.tree_map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
        return SGDState(step=jnp.zeros((), jnp.int32), velocity=vel)

    def step(self, state: SGDState, params, grads, lr=None, rng=None):
        cfg = self.config
        lr = cfg.learning_rate if lr is None else lr

        def upd(p, v, g):
            g32 = g.astype(jnp.float32) + cfg.weight_decay * p.astype(jnp.float32)
            v_new = cfg.momentum * v + g32
            d = g32 + cfg.momentum * v_new if cfg.nesterov else v_new
            return (p.astype(jnp.float32) - lr * d).astype(p.dtype), v_new

        out = jax.tree_util.tree_map(upd, params, state.velocity, grads)
        is_pair = lambda o: isinstance(o, tuple)  # noqa: E731
        p_new = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=is_pair)
        v_new = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=is_pair)
        return p_new, SGDState(step=state.step + 1, velocity=v_new)
