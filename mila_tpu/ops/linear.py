"""Linear (dense) op: y = x @ w + b, with manual VJP.

Parity: reference flagship op ``CudaLinearOp``
(Devices/Cuda/Operations/CudaLinearOp.ixx): forward cuBLASLt matmul with bias
epilogue (build_forward_plan:147-225), backward-input dX (``:228-286``),
backward-weight dW (``:306-366``) and warp bias-reduction
(Kernels/MatMul/CudaReduction.cu:15-103); CPU oracle ``CpuLinearOp.ixx:68``.

TPU-native redesign: weights are stored ``[in, out]`` (not the reference's
``[out, in]``) so the forward is a single MXU-shaped ``x @ w`` contraction;
the bias add fuses into the matmul epilogue under XLA. The manual VJP
reproduces the reference's backward exactly: dx = g @ w^T, dw = x^T @ g,
db = sum(g, batch axes) — the bias reduction the reference needed a custom
warp kernel for is an XLA column reduction here. Accumulation across
microbatches (the reference's beta=1 dW accumulate, CudaLinearOp.ixx:937-962)
is expressed by the caller summing grads, as is idiomatic in JAX.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


# f32 inputs use full-precision passes (the reference computes exact FP32 FMA;
# JAX's default matmul precision drops f32 to bf16 passes). bf16/int8 inputs
# are MXU-native either way, so this costs nothing on the performance path.
_PRECISION = jax.lax.Precision.HIGHEST


def _forward(x: jax.Array, w: jax.Array, b: Optional[jax.Array], accum_dtype) -> jax.Array:
    y = jnp.matmul(x, w, preferred_element_type=accum_dtype, precision=_PRECISION)
    if b is not None:
        y = y + b.astype(accum_dtype)
    return y.astype(x.dtype)


@jax.custom_vjp
def linear(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """Dense layer: ``x @ w (+ b)``.

    x: [..., in_features]; w: [in_features, out_features]; b: [out_features].
    Accumulates in float32 on the MXU regardless of storage dtype.
    """
    return _forward(x, w, b, jnp.float32)


def _linear_fwd(x, w, b):
    return _forward(x, w, b, jnp.float32), (x, w, b is not None)


def _linear_bwd(res, g):
    x, w, has_bias = res
    g32 = g  # keep incoming grad dtype; accumulate contractions in f32
    # dX = g @ w^T  (overwrite semantics, beta=0 — CudaLinearOp.ixx:937)
    dx = jnp.matmul(
        g32, w.T, preferred_element_type=jnp.float32, precision=_PRECISION
    ).astype(x.dtype)
    # dW = x^T @ g over all batch dims (beta=1 accumulate handled by caller).
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g32.reshape(-1, g32.shape[-1])
    dw = jnp.matmul(
        x2.T, g2, preferred_element_type=jnp.float32, precision=_PRECISION
    ).astype(w.dtype)
    # dB = sum over batch axes (CudaReduction.cu warp bias kernel parity).
    db = g2.sum(axis=0, dtype=jnp.float32).astype(g.dtype) if has_bias else None
    return dx, dw, db


linear.defvjp(_linear_fwd, _linear_bwd)


def linear_ref(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """Oracle implementation using jax autodiff end-to-end (CpuLinearOp parity)."""
    y = x @ w
    return y + b if b is not None else y


def linear_gelu(
    x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
    approximation: str = "tanh",
) -> jax.Array:
    """Fused linear + GELU (CudaLinearGeluOp.ixx:41-94 parity — cuBLASLt's
    GELU epilogue). Under jit XLA fuses the activation into the matmul
    epilogue; the quantized path has the same fusion in the Pallas kernel
    (quant_linear(..., activation='gelu'))."""
    from mila_tpu.ops.gelu import gelu

    return gelu(linear(x, w, b), approximation)
