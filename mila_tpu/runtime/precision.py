"""Compute-precision policy.

Parity: reference ``ComputePrecision::Policy`` enum {Native, Performance,
Accuracy, Auto} (Compute/ComputePrecision.ixx:30-35), threaded through every
component config. TPU-native mapping: the policy resolves to (param_dtype,
compute_dtype, accum_dtype) triples — Performance = bf16 params/compute with
f32 accumulation (the MXU's native mode), Accuracy = f32 everywhere, Native =
keep the caller's dtype, Auto = Performance on accelerators / Accuracy on CPU.
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp


class PrecisionPolicy(enum.Enum):
    NATIVE = "native"
    PERFORMANCE = "performance"
    ACCURACY = "accuracy"
    AUTO = "auto"

    @staticmethod
    def from_string(s: str) -> "PrecisionPolicy":
        key = s.strip().lower()
        for p in PrecisionPolicy:
            if p.value == key:
                return p
        raise ValueError(f"unknown precision policy '{s}'")


@dataclasses.dataclass(frozen=True)
class ResolvedPrecision:
    """Concrete dtypes a policy resolves to for a given context."""

    param_dtype: jnp.dtype
    compute_dtype: jnp.dtype
    accum_dtype: jnp.dtype


def resolve(
    policy: PrecisionPolicy,
    *,
    on_accelerator: bool = True,
    native_dtype=jnp.float32,
) -> ResolvedPrecision:
    f32 = jnp.dtype(jnp.float32)
    bf16 = jnp.dtype(jnp.bfloat16)
    if policy == PrecisionPolicy.AUTO:
        policy = PrecisionPolicy.PERFORMANCE if on_accelerator else PrecisionPolicy.ACCURACY
    if policy == PrecisionPolicy.ACCURACY:
        return ResolvedPrecision(f32, f32, f32)
    if policy == PrecisionPolicy.PERFORMANCE:
        # bf16 storage+compute, f32 MXU accumulation — TPU speed-of-light mode.
        return ResolvedPrecision(bf16, bf16, f32)
    nd = jnp.dtype(native_dtype)
    return ResolvedPrecision(nd, nd, f32)
