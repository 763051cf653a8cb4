"""GELU activation: exact / tanh / sigmoid approximations, manual VJP.

Parity: reference ``CpuGeluOp.ixx`` (tanh-approx fwd/bwd), CUDA kernels
``Kernels/CudaGelu.cu:29,54`` (fp32) / ``:89-146`` (half2-vectorized fp16),
approximation selector ``GeluConfig.ixx:41-44`` {Exact, Tanh, Sigmoid}.
TPU-native: VPU elementwise, fused by XLA into neighboring matmuls; manual
VJPs mirror the reference's closed-form backward.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)
GELU_COEF = 0.044715


# --- tanh approximation (the reference's default) ---

@jax.custom_vjp
def gelu_tanh(x: jax.Array) -> jax.Array:
    """0.5·x·(1+tanh(√(2/π)·(x+0.044715·x³))) — CudaGelu.cu:29 parity."""
    inner = SQRT_2_OVER_PI * (x + GELU_COEF * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(inner))


def _gelu_tanh_fwd(x):
    return gelu_tanh(x), (x,)


def _gelu_tanh_bwd(res, g):
    (x,) = res
    # Closed-form derivative (CudaGelu.cu:54 backward kernel parity).
    x3 = x * x * x
    inner = SQRT_2_OVER_PI * (x + GELU_COEF * x3)
    t = jnp.tanh(inner)
    sech2 = 1.0 - t * t
    dinner = SQRT_2_OVER_PI * (1.0 + 3.0 * GELU_COEF * x * x)
    dgelu = 0.5 * (1.0 + t) + 0.5 * x * sech2 * dinner
    return (g * dgelu,)


gelu_tanh.defvjp(_gelu_tanh_fwd, _gelu_tanh_bwd)


# --- exact (erf-based) ---

@jax.custom_vjp
def gelu_exact(x: jax.Array) -> jax.Array:
    """x·Φ(x) with Φ the standard normal CDF (GeluConfig Exact mode)."""
    return 0.5 * x * (1.0 + jax.lax.erf(x * (1.0 / math.sqrt(2.0))))


def _gelu_exact_fwd(x):
    return gelu_exact(x), (x,)


def _gelu_exact_bwd(res, g):
    (x,) = res
    cdf = 0.5 * (1.0 + jax.lax.erf(x * (1.0 / math.sqrt(2.0))))
    pdf = jnp.exp(-0.5 * x * x) * (1.0 / math.sqrt(2.0 * math.pi))
    return (g * (cdf + x * pdf),)


gelu_exact.defvjp(_gelu_exact_fwd, _gelu_exact_bwd)


# --- sigmoid approximation ---

@jax.custom_vjp
def gelu_sigmoid(x: jax.Array) -> jax.Array:
    """x·σ(1.702x) (GeluConfig Sigmoid mode)."""
    return x * jax.nn.sigmoid(1.702 * x)


def _gelu_sigmoid_fwd(x):
    return gelu_sigmoid(x), (x,)


def _gelu_sigmoid_bwd(res, g):
    (x,) = res
    s = jax.nn.sigmoid(1.702 * x)
    return (g * (s + 1.702 * x * s * (1.0 - s)),)


gelu_sigmoid.defvjp(_gelu_sigmoid_fwd, _gelu_sigmoid_bwd)


GELU_VARIANTS = {
    "tanh": gelu_tanh,
    "exact": gelu_exact,
    "sigmoid": gelu_sigmoid,
}


def gelu(x: jax.Array, approximation: str = "tanh") -> jax.Array:
    try:
        return GELU_VARIANTS[approximation](x)
    except KeyError:
        raise ValueError(
            f"unknown GELU approximation '{approximation}'; options: {sorted(GELU_VARIANTS)}"
        ) from None
