"""Free-function tensor ops: math, fill, transfer, axis partitioning.

Parity: reference ``TensorOps`` dispatch (Tensors/Operations/TensorOps.ixx,
TensorOps.Math.ixx:80-253), CPU/CUDA TensorOps and the elementwise/fill/copy
CUDA kernels (Devices/Cuda/Tensors/Operations/Kernels/*). TPU-native redesign:
jnp already provides fused elementwise math on the VPU; this module keeps the
reference's *API surface* (add/subtract/multiply/divide/fill/copy with
conversion-on-copy) plus ``compute_axis_partition``
(Tensor.Partitioning.ixx:17-35) used by axis-generic softmax/layernorm.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# --- math (TensorOps.Math.ixx parity) ---

def add(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.add(a, b)


def subtract(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.subtract(a, b)


def multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.multiply(a, b)


def divide(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.divide(a, b)


def scale(a: jax.Array, s: float) -> jax.Array:
    return a * s


# --- fill (TensorOps.Fill parity) ---

def fill(shape, value: float, dtype=jnp.float32) -> jax.Array:
    return jnp.full(shape, value, dtype=dtype)


def fill_like(x: jax.Array, value: float) -> jax.Array:
    return jnp.full_like(x, value)


# --- transfer (CudaTensorOps.Transfer.ixx:113-258 parity) ---

def copy(src, dtype=None, device: Optional[jax.Device] = None, sharding=None) -> jax.Array:
    """Copy with optional conversion-on-copy and placement.

    The reference's transfer kernels convert FP32↔FP16 during device copies
    (Kernels/TensorCopy.cu); here ``astype`` fuses into the transfer under jit,
    and placement is expressed with ``device_put`` (sharding-aware).
    """
    x = jnp.asarray(src)
    if dtype is not None and x.dtype != jnp.dtype(dtype):
        x = x.astype(dtype)
    target = sharding if sharding is not None else device
    if target is not None:
        x = jax.device_put(x, target)
    return x


def to_host(x: jax.Array) -> np.ndarray:
    """D2H copy (forces sync, like CudaTensorOps.Transfer.ixx:237-258)."""
    return np.asarray(jax.device_get(x))


# --- axis partitioning (Tensor.Partitioning.ixx:17-35 parity) ---

@dataclasses.dataclass(frozen=True)
class AxisPartition:
    """Decomposition of a shape around a normalized axis.

    ``outer`` × ``axis`` × ``inner`` covers the array; ``num_slices`` =
    outer*inner is the number of independent 1-D fibers along ``axis``.
    """

    outer: int
    axis_size: int
    inner: int
    axis: int

    @property
    def num_slices(self) -> int:
        return self.outer * self.inner


def normalize_axis(axis: int, ndim: int) -> int:
    if not -ndim <= axis < ndim:
        raise ValueError(f"axis {axis} out of range for ndim {ndim}")
    return axis % ndim


def describe(x, name: str = "tensor", edge: int = 3) -> str:
    """Human-readable tensor digest (Tensor.ixx:1114 pretty-print parity)."""
    arr = np.asarray(jax.device_get(x))
    flat = arr.reshape(-1)
    head = ", ".join(f"{v:.4g}" for v in flat[:edge])
    tail = ", ".join(f"{v:.4g}" for v in flat[-edge:]) if flat.size > edge else ""
    stats = ""
    if np.issubdtype(arr.dtype, np.floating) and arr.size:
        stats = (
            f" mean={arr.mean():.4g} std={arr.std():.4g}"
            f" min={arr.min():.4g} max={arr.max():.4g}"
        )
    body = f"[{head}, …, {tail}]" if flat.size > 2 * edge else f"[{head}]"
    return f"{name}{list(arr.shape)} {arr.dtype}{stats} {body}"


def compute_axis_partition(shape, axis: int) -> AxisPartition:
    ax = normalize_axis(axis, len(shape))
    outer = 1
    for s in shape[:ax]:
        outer *= int(s)
    inner = 1
    for s in shape[ax + 1:]:
        inner *= int(s)
    return AxisPartition(outer=outer, axis_size=int(shape[ax]), inner=inner, axis=ax)
