"""RMSNorm with manual VJP.

Not in the reference snapshot (lives on its dev branch, README.md:5-13);
required by BASELINE for the Llama-3.2 stack. Same design as
:mod:`mila_tpu.ops.layernorm`: f32 statistics, cached rstd, closed-form
backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rms_norm(x: jax.Array, gamma: jax.Array, eps: float = 1e-6) -> jax.Array:
    """x * rsqrt(mean(x²) + eps) * gamma over the last axis."""
    x32 = x.astype(jnp.float32)
    rstd = jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    return (x32 * rstd * gamma.astype(jnp.float32)).astype(x.dtype)


def _rms_fwd(x, gamma, eps):
    x32 = x.astype(jnp.float32)
    rstd = jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    y = (x32 * rstd * gamma.astype(jnp.float32)).astype(x.dtype)
    return y, (x, gamma, rstd)


def _rms_bwd(eps, res, g):
    x, gamma, rstd = res
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    C = x.shape[-1]
    xhat = x32 * rstd
    dgamma = (g32 * xhat).reshape(-1, C).sum(axis=0).astype(gamma.dtype)
    dy = g32 * gamma.astype(jnp.float32)
    # d/dx [x·rstd] = rstd·(dy − xhat·mean(dy·xhat))
    m = (dy * xhat).mean(axis=-1, keepdims=True)
    dx = (rstd * (dy - xhat * m)).astype(x.dtype)
    return dx, dgamma


rms_norm.defvjp(_rms_fwd, _rms_bwd)


def rms_norm_ref(x, gamma, eps: float = 1e-6):
    x32 = x.astype(jnp.float32)
    rstd = jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    return (x32 * rstd * gamma).astype(x.dtype)
