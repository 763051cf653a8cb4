"""Abstract tensor dtype registry with per-dtype traits.

Parity: reference ``TensorDataType`` enum (Tensors/TensorDataType.ixx:35-53)
and ``TensorDataTypeTraits`` (TensorDataTypeTraits.ixx:58-172). TPU-native
redesign: dtypes map to jnp/XLA dtypes; "device-only" in the reference meant
no host arithmetic for FP16/BF16/FP8 — on TPU the analogous trait is
``mxu_native`` (feeds the systolic array directly) and ``packed`` (sub-byte,
needs Pallas unpack). INT4 — "FUTURE" in the reference (TensorDataType.ixx:43-46)
— is first-class here for weight-only quantization.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DTypeTraits:
    """Static traits of an abstract tensor dtype."""

    name: str
    jnp_dtype: jnp.dtype
    bits: int
    is_float: bool
    is_signed: bool
    # True if the MXU consumes this dtype natively (bf16/int8/fp8 on v5).
    mxu_native: bool = False
    # True for sub-byte dtypes that are stored packed (int4/fp4).
    packed: bool = False
    # Minimum Pallas tile (sublane, lane) for this dtype on TPU.
    min_tile: tuple[int, int] = (8, 128)

    @property
    def size_in_bytes(self) -> float:
        return self.bits / 8

    @property
    def finfo(self):
        return jnp.finfo(self.jnp_dtype) if self.is_float else None

    @property
    def iinfo(self):
        return None if self.is_float else jnp.iinfo(self.jnp_dtype)


_REGISTRY: dict[str, DTypeTraits] = {}


def _reg(t: DTypeTraits) -> DTypeTraits:
    _REGISTRY[t.name] = t
    return t


# Floating point (TensorDataType.ixx:36-42 parity + TPU tiling constraints).
FP32 = _reg(DTypeTraits("FP32", jnp.dtype(jnp.float32), 32, True, True, False, min_tile=(8, 128)))
FP16 = _reg(DTypeTraits("FP16", jnp.dtype(jnp.float16), 16, True, True, False, min_tile=(16, 128)))
BF16 = _reg(DTypeTraits("BF16", jnp.dtype(jnp.bfloat16), 16, True, True, True, min_tile=(16, 128)))
FP8_E4M3 = _reg(
    DTypeTraits("FP8_E4M3", jnp.dtype(jnp.float8_e4m3fn), 8, True, True, True, min_tile=(32, 128))
)
FP8_E5M2 = _reg(
    DTypeTraits("FP8_E5M2", jnp.dtype(jnp.float8_e5m2), 8, True, True, True, min_tile=(32, 128))
)

# Integer (TensorDataType.ixx:47-53 parity).
INT8 = _reg(DTypeTraits("INT8", jnp.dtype(jnp.int8), 8, False, True, True, min_tile=(32, 128)))
INT16 = _reg(DTypeTraits("INT16", jnp.dtype(jnp.int16), 16, False, True, min_tile=(16, 128)))
INT32 = _reg(DTypeTraits("INT32", jnp.dtype(jnp.int32), 32, False, True, min_tile=(8, 128)))
UINT8 = _reg(DTypeTraits("UINT8", jnp.dtype(jnp.uint8), 8, False, False, min_tile=(32, 128)))
UINT16 = _reg(DTypeTraits("UINT16", jnp.dtype(jnp.uint16), 16, False, False, min_tile=(16, 128)))
UINT32 = _reg(DTypeTraits("UINT32", jnp.dtype(jnp.uint32), 32, False, False, min_tile=(8, 128)))

# Sub-byte quantization dtypes ("FUTURE" in the reference; first-class here).
INT4 = _reg(DTypeTraits("INT4", jnp.dtype(jnp.int4), 4, False, True, True, True, (32, 128)))


def all_dtypes() -> list[DTypeTraits]:
    return list(_REGISTRY.values())


def from_name(name: str) -> DTypeTraits:
    """Look up a dtype by abstract name ("BF16") or jnp name ("bfloat16")."""
    key = name.upper()
    if key in _REGISTRY:
        return _REGISTRY[key]
    # Accept numpy/jnp dtype names too.
    for t in _REGISTRY.values():
        if t.jnp_dtype.name == name:
            return t
    raise KeyError(f"unknown dtype '{name}'; known: {sorted(_REGISTRY)}")


def from_jnp(dtype) -> DTypeTraits:
    d = jnp.dtype(dtype)
    for t in _REGISTRY.values():
        if t.jnp_dtype == d:
            return t
    raise KeyError(f"no abstract dtype for jnp dtype {d}")


def to_name(dtype) -> str:
    return from_jnp(dtype).name


def is_float_type(dtype) -> bool:
    return from_jnp(dtype).is_float


def itemsize_bits(dtype) -> int:
    return from_jnp(dtype).bits


def host_equivalent(dtype) -> np.dtype:
    """Host-side numpy dtype for staging/serialization.

    Parity: ``TensorHostTypeMap`` (Tensors/TensorHostTypeMap.ixx) — narrow
    float types stage through fp32 on host; sub-byte ints through int8.
    """
    t = from_jnp(dtype)
    if t.is_float and t.bits < 16:
        return np.dtype(np.float32)
    if t.packed:
        return np.dtype(np.int8)
    if t.jnp_dtype == jnp.bfloat16:
        # numpy has no bf16; ml_dtypes provides it via jnp dtype's type.
        return np.dtype(t.jnp_dtype)
    return np.dtype(t.jnp_dtype)
