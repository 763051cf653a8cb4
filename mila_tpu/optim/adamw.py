"""AdamW optimizer: bias correction, decoupled weight decay, stochastic
rounding with f32 master params.

Parity: reference ``AdamWOptimizer`` facade (Optimizers/AdamW.ixx:39-41),
``AdamWConfig`` builder (AdamWConfig.ixx), CPU impl
(Devices/Cpu/Optimizers/CpuAdamWOptimizer.ixx) and the CUDA kernel
(Devices/Cuda/Optimizers/CudaAdamW.cu): lerp-form moment updates (:57-70),
bias correction, decoupled decay, **stochastic rounding to bf16/fp16 with
master-param support** (:13-23, adamw_kernel3 :112-123), ``zeroGrad`` via
memset (:278). TPU-native redesign: a functional optimizer over pytrees —
``init(params) → state``, ``step(state, params, grads) → (params', state')``
— fully jittable; the whole update fuses into one XLA kernel per parameter.
Stochastic rounding uses the bit-trick (add random low bits, truncate), the
same construction the Pallas fused kernel uses on-chip.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mila_tpu.utils.config import BaseConfig, ConfigError

Params = Any
Grads = Any


@dataclasses.dataclass(frozen=True)
class AdamWConfig(BaseConfig):
    """Hyperparameters (AdamWConfig.ixx parity, same defaults)."""

    learning_rate: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.01
    # When params are stored bf16/fp16: keep f32 masters and stochastically
    # round the updated master back to storage dtype (CudaAdamW.cu:13-23).
    stochastic_rounding: bool = False
    grad_clip_norm: float = 0.0  # 0 = off

    def validate(self):
        if self.learning_rate <= 0:
            raise ConfigError(f"learning_rate must be positive, got {self.learning_rate}")
        if not 0 <= self.beta1 < 1 or not 0 <= self.beta2 < 1:
            raise ConfigError("betas must be in [0, 1)")
        if self.eps <= 0:
            raise ConfigError("eps must be positive")
        if self.weight_decay < 0:
            raise ConfigError("weight_decay must be non-negative")


class AdamWState(NamedTuple):
    step: jax.Array  # int32 scalar
    m: Params  # first moments (f32)
    v: Params  # second moments (f32)
    master: Optional[Params]  # f32 master params when stochastic rounding


def _stochastic_round(x32: jax.Array, key: jax.Array, target_dtype) -> jax.Array:
    """Round f32 → 16-bit float by adding random low bits and truncating.

    For bf16: add uniform u16 to the f32 bit pattern, then truncate the low
    16 bits — unbiased rounding (same math as pltpu.stochastic_round).
    """
    td = jnp.dtype(target_dtype)
    if td == jnp.bfloat16:
        bits = jax.lax.bitcast_convert_type(x32, jnp.uint32)
        noise = jax.random.bits(key, x32.shape, jnp.uint32) & jnp.uint32(0xFFFF)
        rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
        return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(jnp.bfloat16)
    if td == jnp.float16:
        # Via nearest-representable pair: lerp by random uniform against gap.
        lo = x32.astype(jnp.float16)
        lo32 = lo.astype(jnp.float32)
        hi = jnp.where(x32 > lo32, jax.lax.nextafter(lo32, jnp.float32(jnp.inf)),
                       jax.lax.nextafter(lo32, jnp.float32(-jnp.inf)))
        gap = hi - lo32
        frac = jnp.where(gap != 0, (x32 - lo32) / jnp.where(gap == 0, 1.0, gap), 0.0)
        u = jax.random.uniform(key, x32.shape, jnp.float32)
        return jnp.where(u < jnp.abs(frac), hi, lo32).astype(jnp.float16)
    return x32.astype(td)


def global_norm(grads: Grads) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))


class AdamW:
    """Functional AdamW (Optimizer interface parity: addParameter ⇒ pytree,
    step ⇒ :meth:`step`, zeroGrad ⇒ :func:`zero_grads`, LR get/set ⇒
    ``lr`` argument / :attr:`config`)."""

    def __init__(self, config: Optional[AdamWConfig] = None):
        self.config = config or AdamWConfig()
        self.config.validate()

    def init(self, params: Params) -> AdamWState:
        zeros32 = lambda p: jnp.zeros(p.shape, jnp.float32)  # noqa: E731
        m = jax.tree_util.tree_map(zeros32, params)
        v = jax.tree_util.tree_map(zeros32, params)
        master = None
        if self.config.stochastic_rounding:
            # f32 masters for low-precision params (init_from_master_kernel
            # parity, CudaAdamW.cu:129).
            master = jax.tree_util.tree_map(lambda p: p.astype(jnp.float32), params)
        return AdamWState(step=jnp.zeros((), jnp.int32), m=m, v=v, master=master)

    def step(
        self,
        state: AdamWState,
        params: Params,
        grads: Grads,
        lr: Optional[jax.Array | float] = None,
        rng: Optional[jax.Array] = None,
    ) -> tuple[Params, AdamWState]:
        """One AdamW update. Jit-friendly; ``lr`` may be a traced scalar
        (schedule), ``rng`` seeds stochastic rounding."""
        cfg = self.config
        lr = cfg.learning_rate if lr is None else lr
        t = state.step + 1
        tf = t.astype(jnp.float32)
        bc1 = 1.0 - cfg.beta1**tf
        bc2 = 1.0 - cfg.beta2**tf

        if cfg.grad_clip_norm > 0:
            gn = global_norm(grads)
            clip = jnp.minimum(1.0, cfg.grad_clip_norm / (gn + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * clip, grads)

        src = state.master if state.master is not None else params
        leaves, treedef = jax.tree_util.tree_flatten(params)
        if rng is None:
            rng = jax.random.key(0)
        keys = jax.random.split(rng, len(leaves))
        key_tree = jax.tree_util.tree_unflatten(treedef, list(keys))

        def upd(p, src_p, m, v, g, key):
            g32 = g.astype(jnp.float32)
            p32 = src_p.astype(jnp.float32)
            # lerp-form moment updates (CudaAdamW.cu:57-70).
            m_new = cfg.beta1 * m + (1.0 - cfg.beta1) * g32
            v_new = cfg.beta2 * v + (1.0 - cfg.beta2) * g32 * g32
            m_hat = m_new / bc1
            v_hat = v_new / bc2
            # decoupled weight decay on the (master) param.
            p32_new = p32 - lr * (m_hat / (jnp.sqrt(v_hat) + cfg.eps) + cfg.weight_decay * p32)
            if cfg.stochastic_rounding and p.dtype in (jnp.bfloat16, jnp.float16):
                p_new = _stochastic_round(p32_new, key, p.dtype)
            else:
                p_new = p32_new.astype(p.dtype)
            return p_new, p32_new, m_new, v_new

        out = jax.tree_util.tree_map(upd, params, src, state.m, state.v, grads, key_tree)
        # Unzip the 4-tuples back into trees.
        p_new = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=lambda o: isinstance(o, tuple))
        p32_new = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=lambda o: isinstance(o, tuple))
        m_new = jax.tree_util.tree_map(lambda o: o[2], out, is_leaf=lambda o: isinstance(o, tuple))
        v_new = jax.tree_util.tree_map(lambda o: o[3], out, is_leaf=lambda o: isinstance(o, tuple))
        master_new = p32_new if state.master is not None else None
        return p_new, AdamWState(step=t, m=m_new, v=v_new, master=master_new)

    # Optimizer-interface parity helpers.
    def get_learning_rate(self) -> float:
        return self.config.learning_rate

    def set_learning_rate(self, lr: float) -> None:
        self.config = self.config.replace(learning_rate=lr)


def zero_grads(params: Params) -> Grads:
    """Fresh zero gradient pytree (zeroGrad/memset parity)."""
    return jax.tree_util.tree_map(lambda p: jnp.zeros_like(p), params)
