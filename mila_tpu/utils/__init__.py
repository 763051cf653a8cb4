"""Core services: logging, RNG, config, registries.

Parity: reference layer 0 (``Mila/Src/Utils/``, SURVEY.md §1 row 0).
"""

from mila_tpu.utils.config import BaseConfig, ConfigError
from mila_tpu.utils.logging import Logger, LogLevel, StepLogger
from mila_tpu.utils.registry import Registry
from mila_tpu.utils.rng import RandomGenerator, split_named

__all__ = [
    "BaseConfig",
    "ConfigError",
    "Logger",
    "LogLevel",
    "StepLogger",
    "Registry",
    "RandomGenerator",
    "split_named",
]
