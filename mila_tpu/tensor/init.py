"""Tensor initializers.

Parity: reference ``Tensor.Initializers.ixx:110-207`` (random uniform, xavier,
zeros/ones via fill). TPU-native redesign: pure functions over PRNG keys that
can run jitted on device (the reference host-generates then copies H2D).
He/normal/truncated-normal added (needed by the transformer stack).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

Shape = Sequence[int]


def zeros(shape: Shape, dtype=jnp.float32) -> jax.Array:
    return jnp.zeros(shape, dtype=dtype)


def ones(shape: Shape, dtype=jnp.float32) -> jax.Array:
    return jnp.ones(shape, dtype=dtype)


def full(shape: Shape, value: float, dtype=jnp.float32) -> jax.Array:
    return jnp.full(shape, value, dtype=dtype)


def uniform(
    key: jax.Array, shape: Shape, minval: float = -1.0, maxval: float = 1.0, dtype=jnp.float32
) -> jax.Array:
    """Uniform random init (Tensor.Initializers.ixx ``random`` parity)."""
    return jax.random.uniform(key, shape, minval=minval, maxval=maxval, dtype=jnp.float32).astype(
        dtype
    )


def normal(key: jax.Array, shape: Shape, stddev: float = 0.02, dtype=jnp.float32) -> jax.Array:
    """Gaussian init (GPT-2 style, stddev 0.02 by default)."""
    return (jax.random.normal(key, shape, dtype=jnp.float32) * stddev).astype(dtype)


def truncated_normal(
    key: jax.Array, shape: Shape, stddev: float = 0.02, dtype=jnp.float32
) -> jax.Array:
    return (jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype=jnp.float32) * stddev).astype(
        dtype
    )


def _fans(shape: Shape) -> tuple[int, int]:
    """(fan_in, fan_out) with weight layout [..., in, out] for >=2D.

    Note the reference stores Linear weights ``[out, in]`` (Linear.ixx:640);
    we use the TPU-friendly ``[in, out]`` layout (activations @ weight maps
    directly onto the MXU without transposition), so fans are (shape[-2], shape[-1]).
    """
    if len(shape) < 2:
        return int(shape[0]), int(shape[0])
    receptive = 1
    for s in shape[:-2]:
        receptive *= int(s)
    return int(shape[-2]) * receptive, int(shape[-1]) * receptive


def xavier_uniform(key: jax.Array, shape: Shape, dtype=jnp.float32) -> jax.Array:
    """Glorot/Xavier uniform (Tensor.Initializers.ixx:193 parity)."""
    fan_in, fan_out = _fans(shape)
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return uniform(key, shape, -limit, limit, dtype)


def xavier_normal(key: jax.Array, shape: Shape, dtype=jnp.float32) -> jax.Array:
    fan_in, fan_out = _fans(shape)
    return normal(key, shape, math.sqrt(2.0 / (fan_in + fan_out)), dtype)


def he_uniform(key: jax.Array, shape: Shape, dtype=jnp.float32) -> jax.Array:
    fan_in, _ = _fans(shape)
    limit = math.sqrt(6.0 / fan_in)
    return uniform(key, shape, -limit, limit, dtype)


def he_normal(key: jax.Array, shape: Shape, dtype=jnp.float32) -> jax.Array:
    fan_in, _ = _fans(shape)
    return normal(key, shape, math.sqrt(2.0 / fan_in), dtype)


INITIALIZERS = {
    "zeros": zeros,
    "ones": ones,
    "uniform": uniform,
    "normal": normal,
    "truncated_normal": truncated_normal,
    "xavier_uniform": xavier_uniform,
    "xavier": xavier_uniform,
    "xavier_normal": xavier_normal,
    "he_uniform": he_uniform,
    "he_normal": he_normal,
}
