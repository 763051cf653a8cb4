"""Axis-generic numerically-stable softmax with manual VJP.

Parity: reference ``CpuSoftmaxOp.ixx`` (AxisPartition-based any-axis softmax)
and CUDA kernels ``Kernels/CudaSoftmax.cu:14-137`` (general outer/dim/inner
decomposition + specialized row-wise last-dim kernels). TPU-native: XLA fuses
the max/exp/sum pipeline on the VPU; any-axis works directly via the axis
argument (no manual partition loop needed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    x32 = x.astype(jnp.float32)
    z = x32 - jax.lax.stop_gradient(x32.max(axis=axis, keepdims=True))
    e = jnp.exp(z)
    return (e / e.sum(axis=axis, keepdims=True)).astype(x.dtype)


def _softmax_fwd(x, axis):
    y = softmax(x, axis)
    return y, (y,)


def _softmax_bwd(axis, res, g):
    (y,) = res
    y32 = y.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    # dx = y ⊙ (g − Σ g·y) — the standard softmax Jacobian-vector product.
    dot = (g32 * y32).sum(axis=axis, keepdims=True)
    return ((y32 * (g32 - dot)).astype(y.dtype),)


softmax.defvjp(_softmax_fwd, _softmax_bwd)


def log_softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    x32 = x.astype(jnp.float32)
    z = x32 - x32.max(axis=axis, keepdims=True)
    return (z - jnp.log(jnp.exp(z).sum(axis=axis, keepdims=True))).astype(x.dtype)
