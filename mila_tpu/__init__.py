"""mila_tpu — a TPU-native deep learning framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the Mila
DNN library (C++23/CUDA reference; see SURVEY.md): typed tensor system,
manual-VJP op library, composable component/model API, AdamW with stochastic
rounding, zip/json checkpointing, dataset readers, and MNIST/CharLM/GPT-2/
Llama workloads — extended to a quantized inference engine with INT8/FP8
weight-only Pallas kernels, fused attention, paged KV-cache, continuous
batching, and multi-host mesh sharding.

Facade parity: reference umbrella module ``Mila/Src/Mila.ixx:29-224`` and
``Mila::initialize(seed)`` (Mila.ixx:262-287).
"""

from __future__ import annotations

from typing import Optional

from mila_tpu.version import __version__, get_api_version

_initialized = False


def initialize(seed: int = 0, log_level: Optional[int] = None) -> None:
    """Framework init: seed RNG streams, wire logging, touch registries.

    Parity: ``Mila::initialize`` (Mila.ixx:262-287) — logger + RNG seed +
    operation/device registrars. Importing :mod:`mila_tpu.ops` populates the
    operation registry (the OperationsRegistrar analogue); device discovery is
    lazy via :func:`mila_tpu.runtime.default_context`.
    """
    global _initialized
    from mila_tpu import ops  # noqa: F401 - registers operations
    from mila_tpu.utils.logging import Logger
    from mila_tpu.utils.rng import RandomGenerator

    if log_level is not None:
        Logger.set_level(log_level)
    RandomGenerator.set_seed(seed)
    _initialized = True
    Logger.debug("mila_tpu {} initialized (seed={})", __version__, seed)


def is_initialized() -> bool:
    return _initialized


def shutdown() -> None:
    """Parity: ``Mila::shutdown()`` (Mila.ixx:289). JAX owns device teardown;
    this just resets framework state."""
    global _initialized
    _initialized = False


__all__ = ["__version__", "get_api_version", "initialize", "is_initialized", "shutdown"]
