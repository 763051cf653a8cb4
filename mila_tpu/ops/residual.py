"""Residual (elementwise add) op with manual VJP.

Parity: reference ``CpuResidualOp.ixx`` and CUDA kernels
``Kernels/CudaResidual.cu:22-233`` (fp32 + float4 / fp16 + half2 vectorized
add fwd/bwd). On TPU this is a VPU add that XLA fuses away; the op exists for
API parity and as the custom-VJP seam (grad flows unchanged to both inputs —
the "residual-grad summation trick" of Transformer.ixx:154-214 is then just
JAX accumulating cotangents).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def residual(x: jax.Array, skip: jax.Array) -> jax.Array:
    return x + skip


def _res_fwd(x, skip):
    return x + skip, None


def _res_bwd(_, g):
    return g, g


residual.defvjp(_res_fwd, _res_bwd)
