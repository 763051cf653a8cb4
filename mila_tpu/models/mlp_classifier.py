"""MNIST MLP classifier — the reference's validated end-to-end workload.

Parity: reference ``MnistClassifier`` (Samples/MNIST/Src/MnistClassifier.ixx:
784→Linear(128)→GELU→Linear(64)→GELU→Linear(10)) and the ``trainMnist`` loop
(Mnist.cpp:315-530) — except the loss runs fused on device and the whole
step is one XLA program (the reference round-trips logits to the CPU for
softmax-CE, its known bottleneck).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mila_tpu.nn import Gelu, GeluConfig, Linear, LinearConfig, Sequential
from mila_tpu.utils.config import BaseConfig, ConfigError
from mila_tpu.utils.registry import models as _models


@dataclasses.dataclass(frozen=True)
class MLPClassifierConfig(BaseConfig):
    input_dim: int = 784
    hidden_dims: tuple = (128, 64)
    num_classes: int = 10
    activation: str = "tanh"  # GELU approximation
    param_dtype: str = "float32"

    def validate(self):
        if self.input_dim <= 0 or self.num_classes <= 0:
            raise ConfigError("positive dims required")
        if not self.hidden_dims:
            raise ConfigError("need at least one hidden layer")


class MLPClassifier(Sequential):
    """784→128→64→10 GELU MLP (MnistClassifier.ixx:6,35 parity)."""

    def __init__(self, config: Optional[MLPClassifierConfig] = None):
        cfg = config or MLPClassifierConfig()
        cfg.validate()
        layers = []
        dims = [cfg.input_dim, *cfg.hidden_dims]
        for i in range(len(dims) - 1):
            layers.append(
                (
                    f"fc{i + 1}",
                    Linear(
                        LinearConfig(
                            name=f"fc{i + 1}",
                            in_features=dims[i],
                            out_features=dims[i + 1],
                            param_dtype=cfg.param_dtype,
                        )
                    ),
                )
            )
            layers.append((f"act{i + 1}", Gelu(GeluConfig(approximation=cfg.activation))))
        layers.append(
            (
                "head",
                Linear(
                    LinearConfig(
                        name="head",
                        in_features=dims[-1],
                        out_features=cfg.num_classes,
                        param_dtype=cfg.param_dtype,
                    )
                ),
            )
        )
        super().__init__(layers, cfg)


def accuracy(logits, targets) -> float:
    """Classification accuracy (Mnist.cpp:274-309 parity)."""
    pred = np.asarray(jnp.argmax(logits, axis=-1))
    return float((pred == np.asarray(targets)).mean())


_models.register("MLPClassifier", MLPClassifier)
