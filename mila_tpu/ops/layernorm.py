"""LayerNorm with manual VJP caching mean/rstd, axis-generic.

Parity: reference ``CpuLayerNormOp.ixx`` (mean/rstd caching fwd + full bwd),
CUDA cooperative-groups warp-per-row kernel ``Kernels/CudaLayerNorm.cu:13-67``,
component config eps/axis (LayerNormConfig.ixx). TPU-native: row statistics
are VPU reductions fused by XLA; the manual VJP recomputes xhat from cached
(mean, rstd) exactly as the reference backward does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _stats(x32: jax.Array, eps: float):
    mean = x32.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return mean, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(
    x: jax.Array, gamma: jax.Array, beta: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """Normalize over the last axis, then scale/shift.

    x: [..., C]; gamma, beta: [C]. Statistics in float32 regardless of input
    dtype (the CUDA kernel also accumulates in fp32, CudaLayerNorm.cu:13).
    """
    x32 = x.astype(jnp.float32)
    mean, rstd = _stats(x32, eps)
    xhat = (x32 - mean) * rstd
    return (xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)


def _ln_fwd(x, gamma, beta, eps):
    x32 = x.astype(jnp.float32)
    mean, rstd = _stats(x32, eps)
    xhat = (x32 - mean) * rstd
    y = (xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)
    # Residuals mirror the reference's cached mean/rstd (CpuLayerNormOp).
    return y, (x, gamma, mean, rstd)


def _ln_bwd(eps, res, g):
    x, gamma, mean, rstd = res
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    xhat = (x32 - mean) * rstd
    C = x.shape[-1]
    dgamma = (g32 * xhat).reshape(-1, C).sum(axis=0).astype(gamma.dtype)
    dbeta = g32.reshape(-1, C).sum(axis=0).astype(gamma.dtype)
    # dX per reference backward: rstd * (dy*γ − mean(dy*γ) − xhat*mean(dy*γ*xhat))
    dy = g32 * gamma.astype(jnp.float32)
    m1 = dy.mean(axis=-1, keepdims=True)
    m2 = (dy * xhat).mean(axis=-1, keepdims=True)
    dx = (rstd * (dy - m1 - xhat * m2)).astype(x.dtype)
    return dx, dgamma, dbeta


layer_norm.defvjp(_ln_fwd, _ln_bwd)


def layer_norm_ref(x, gamma, beta, eps: float = 1e-5):
    """Oracle via plain jnp autodiff (CpuLayerNormOp parity)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    xhat = (x32 - mean) / jnp.sqrt(var + eps)
    return (xhat * gamma + beta).astype(x.dtype)
