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
    """Quantized weight: q [in, out] int8/fp8/int4, scales [n_blocks, out] f32.

    ``packed_rows`` > 0 marks int4 nibble packing: q is int8 [in//2, out]
    where byte row r holds value row r in the low nibble and row
    r + in//2 in the high nibble; ``packed_rows`` is the original ``in``.
    """

    q: jax.Array
    scale: jax.Array
    block_size: int  # static: rows of q per scale row
    packed_rows: int = 0  # static: original K when int4-packed, else 0

    @property
    def shape(self):
        if self.packed_rows:
            return (self.packed_rows, self.q.shape[1])
        return self.q.shape

    @property
    def dtype(self):
        return self.q.dtype


# NamedTuple is already a pytree; block_size/packed_rows ride along as
# leaves? No — they must be static. Register a custom pytree keeping them in
# the treedef.
jax.tree_util.register_pytree_node(
    QTensor,
    lambda t: ((t.q, t.scale), (t.block_size, t.packed_rows)),
    lambda aux, leaves: QTensor(leaves[0], leaves[1], aux[0], aux[1]),
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
    if jnp.dtype(qdt) == jnp.dtype(jnp.int4):
        # True 4-bit storage: nibble-pack into int8 (jnp.int4 arrays occupy a
        # byte per element — packing actually halves HBM).
        q = jnp.clip(jnp.round(scaled), -qmax, qmax).astype(jnp.int8)
        return pack_int4(QTensor(q.reshape(In, Out), scale, bs))
    if jnp.issubdtype(jnp.dtype(qdt), jnp.integer):
        q = jnp.clip(jnp.round(scaled), -qmax, qmax).astype(qdt)
    else:
        q = scaled.astype(qdt)
    return QTensor(q.reshape(In, Out), scale, bs)


def unit_qtensor(w) -> QTensor:
    """Wrap a plain (bf16) weight matrix as a QTensor with unit scales:
    lets the decode weight-stream packers (layer_fused/decode_giga) carry
    bf16 tiles through the same machinery, scale multiply folding to a
    no-op."""
    import jax.numpy as _jnp

    w = _jnp.asarray(w, _jnp.bfloat16)
    K, N = w.shape
    return QTensor(w, _jnp.ones((1, N), _jnp.float32), K, 0)


def pack_int4(qt: QTensor) -> QTensor:
    """Nibble-pack an int4 QTensor: two signed 4-bit values per byte.

    Byte row r = (v[r] & 0xF) | (v[r + K/2] << 4) — the "split-halves" layout
    so one packed tile unpacks into two K-tiles at offsets r and K/2 + r (the
    Pallas kernel slices the resident activations at both ranges). The
    reference marks INT4 "FUTURE" (TensorDataType.ixx:43-46); first-class
    here per SURVEY §2.2.
    """
    if qt.packed_rows:
        return qt
    K = qt.q.shape[0]
    if K % 2:
        raise ValueError("int4 packing needs an even in-dim")
    v = qt.q.astype(jnp.int32)
    lo = v[: K // 2] & 0xF
    hi = v[K // 2:] & 0xF
    packed = jax.lax.bitcast_convert_type(
        (lo | (hi << 4)).astype(jnp.uint8), jnp.int8
    )
    return QTensor(packed, qt.scale, qt.block_size, K)


def unpack_int4(qt: QTensor) -> QTensor:
    """Inverse of :func:`pack_int4` (returns int4-valued int8 rows)."""
    if not qt.packed_rows:
        return qt
    b = qt.q.astype(jnp.int32)
    lo = (b << 28) >> 28  # sign-extend low nibble
    hi = (b << 24) >> 28  # sign-extend high nibble
    full = jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)
    return QTensor(full, qt.scale, qt.block_size, 0)


def dequantize(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    if qt.packed_rows:
        qt = unpack_int4(qt)
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
