"""Weight-only quantization: INT8/FP8/INT4 with per-channel or block scales.

BASELINE north star: "cuBLASLt Linear forward path … becomes JAX/Pallas
weight-only INT8/FP8 dequant+matmul". This module is the quantizer + the
jnp reference dequant-matmul (the Pallas kernel in
:mod:`mila_tpu.kernels.quant_matmul` is the fast path; both share the
``QTensor`` layout so they're interchangeable).

Layout: weight [in, out] quantized along ``in`` (the contraction axis) in
blocks of ``block_size`` rows sharing one f32 scale → scales [n_blocks, out].
Per-channel = one block (block_size >= in). Symmetric absmax scaling.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """Quantized weight: q [in, out] int8/fp8/int4, scales [n_blocks, out] f32."""

    q: jax.Array
    scale: jax.Array
    block_size: int  # static: rows of q per scale row

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.q.dtype


# NamedTuple is already a pytree; block_size rides along as leaf? No — it
# must be static. Register a custom pytree keeping block_size in treedef.
jax.tree_util.register_pytree_node(
    QTensor,
    lambda t: ((t.q, t.scale), t.block_size),
    lambda bs, leaves: QTensor(leaves[0], leaves[1], bs),
)


QUANT_DTYPES = {
    "int8": jnp.int8,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
    "int4": jnp.int4,
}


def _qmax(dtype) -> float:
    d = jnp.dtype(dtype)
    if d == jnp.int8:
        return 127.0
    if d == jnp.dtype(jnp.int4):
        return 7.0
    return float(jnp.finfo(d).max)  # 448 for e4m3, 57344 for e5m2


def quantize(
    w: jax.Array, dtype="int8", block_size: int = 0
) -> QTensor:
    """Symmetric absmax quantization of a [in, out] weight along ``in``."""
    qdt = QUANT_DTYPES[dtype] if isinstance(dtype, str) else dtype
    In, Out = w.shape
    bs = block_size if block_size > 0 else In
    if In % bs != 0:
        raise ValueError(f"in dim {In} not divisible by block_size {bs}")
    w32 = w.astype(jnp.float32).reshape(In // bs, bs, Out)
    absmax = jnp.max(jnp.abs(w32), axis=1)  # [n_blocks, out]
    qmax = _qmax(qdt)
    scale = jnp.maximum(absmax / qmax, 1e-12)
    scaled = w32 / scale[:, None, :]
    if jnp.issubdtype(jnp.dtype(qdt), jnp.integer) or jnp.dtype(qdt) == jnp.dtype(jnp.int4):
        q = jnp.clip(jnp.round(scaled), -qmax, qmax).astype(qdt)
    else:
        q = scaled.astype(qdt)
    return QTensor(q.reshape(In, Out), scale, bs)


def dequantize(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    In, Out = qt.q.shape
    bs = qt.block_size
    q32 = qt.q.reshape(In // bs, bs, Out).astype(jnp.float32)
    return (q32 * qt.scale[:, None, :]).reshape(In, Out).astype(dtype)


def quant_linear_ref(
    x: jax.Array, qt: QTensor, bias: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Reference dequant+matmul: dequantize to compute dtype, then MXU matmul.

    (XLA fuses the dequant multiply into the matmul read; the Pallas kernel
    does it explicitly tile-by-tile in VMEM.)
    """
    w = dequantize(qt, compute_dtype)
    y = jnp.matmul(x.astype(compute_dtype), w, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def quantization_error(w: jax.Array, dtype="int8", block_size: int = 0) -> float:
    """Relative RMS error of quantize→dequantize (diagnostics)."""
    qt = quantize(w, dtype, block_size)
    back = dequantize(qt)
    err = jnp.sqrt(jnp.mean((back - w.astype(jnp.float32)) ** 2))
    rms = jnp.sqrt(jnp.mean(w.astype(jnp.float32) ** 2))
    return float(err / (rms + 1e-12))


# ---------------------------------------------------------------------------
# Model-level weight quantization
# ---------------------------------------------------------------------------

def quantize_model_params(
    params: Any,
    dtype: str = "int8",
    block_size: int = 0,
    min_size: int = 4096,
    skip_names: tuple = ("wte", "wpe", "gamma", "beta", "bias"),
) -> Any:
    """Quantize every 2-D 'weight' leaf of a params tree to a QTensor.

    Embeddings/norms/biases stay high-precision (standard weight-only
    practice; also what BASELINE's 'weight-only' means).
    """

    def visit(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        name = names[-1] if names else ""
        if (
            name == "weight"
            and hasattr(leaf, "ndim")
            and leaf.ndim == 2
            and leaf.size >= min_size
            and not any(s in names for s in skip_names)
        ):
            return quantize(leaf, dtype, block_size)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


def model_bytes(params: Any) -> int:
    """Total parameter bytes, counting packed sub-byte dtypes correctly."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "dtype") and jnp.dtype(leaf.dtype) == jnp.dtype(jnp.int4):
            total += leaf.size // 2
        elif hasattr(leaf, "nbytes"):
            total += leaf.nbytes
    return total
