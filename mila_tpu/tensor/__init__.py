"""Tensor system: dtype registry, initializers, free-function tensor ops.

Parity: reference layer 2 (``Mila/Src/Dnn/Tensors/``, SURVEY.md §2.2). The
``Tensor<TDataType, TMemoryResource>`` class itself maps to ``jax.Array`` —
typed, device-placed, immutable — so this package holds only what jax.Array
doesn't already give us: the abstract dtype registry with TPU tiling traits,
device-side initializers, and the reference's TensorOps API surface.
"""

from mila_tpu.tensor import dtypes, init
from mila_tpu.tensor.tensor_ops import (
    AxisPartition,
    add,
    compute_axis_partition,
    copy,
    divide,
    fill,
    fill_like,
    multiply,
    normalize_axis,
    scale,
    subtract,
    to_host,
)

__all__ = [
    "dtypes",
    "init",
    "AxisPartition",
    "add",
    "subtract",
    "multiply",
    "divide",
    "scale",
    "fill",
    "fill_like",
    "copy",
    "to_host",
    "compute_axis_partition",
    "normalize_axis",
]
