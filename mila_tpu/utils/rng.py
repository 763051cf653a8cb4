"""Seed management and PRNG-key plumbing.

Parity: reference ``Core::RandomGenerator`` (Mila/Src/Utils/RandomGenerator.ixx:20),
seeded from ``Mila::initialize(seed)`` (Mila.ixx:262-287). TPU-native redesign:
JAX's splittable threefry keys instead of a stateful mersenne generator — a
global seed gives a root key; named folds give deterministic, independent
streams for init / dropout / data-shuffling / stochastic rounding.
"""

from __future__ import annotations

import hashlib
import threading
from typing import Optional

import jax
import numpy as np


class RandomGenerator:
    """Process-wide seed registry handing out deterministic PRNG streams.

    Functional code should take explicit ``jax.random.key`` values; this class
    exists for framework entry points (model init, data shuffling) that need a
    deterministic default stream, mirroring ``Mila::initialize(seed)``.
    """

    _lock = threading.Lock()
    _seed: int = 0
    _counter: int = 0

    @classmethod
    def set_seed(cls, seed: int) -> None:
        with cls._lock:
            cls._seed = int(seed)
            cls._counter = 0

    @classmethod
    def get_seed(cls) -> int:
        return cls._seed

    @classmethod
    def root_key(cls) -> jax.Array:
        """The root PRNG key for the current seed."""
        return jax.random.key(cls._seed)

    @classmethod
    def stream(cls, name: str) -> jax.Array:
        """A deterministic, named, independent PRNG stream.

        Same (seed, name) always yields the same key, regardless of call order.
        """
        digest = hashlib.sha256(name.encode()).digest()
        fold = int.from_bytes(digest[:4], "little") & 0x7FFFFFFF
        return jax.random.fold_in(jax.random.key(cls._seed), fold)

    @classmethod
    def next_key(cls) -> jax.Array:
        """A fresh key from the sequential global stream (order-dependent)."""
        with cls._lock:
            c = cls._counter
            cls._counter += 1
        return jax.random.fold_in(jax.random.key(cls._seed), c)

    @classmethod
    def numpy_rng(cls, name: str = "numpy") -> np.random.Generator:
        """A numpy Generator for host-side shuffling, derived from the seed."""
        digest = hashlib.sha256(f"{cls._seed}:{name}".encode()).digest()
        return np.random.default_rng(int.from_bytes(digest[:8], "little"))


def split_named(key: jax.Array, *names: str) -> dict[str, jax.Array]:
    """Split a key into named sub-keys, deterministically by name."""
    out = {}
    for name in names:
        digest = hashlib.sha256(name.encode()).digest()
        fold = int.from_bytes(digest[:4], "little") & 0x7FFFFFFF
        out[name] = jax.random.fold_in(key, fold)
    return out
