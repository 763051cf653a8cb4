"""CNN MNIST classifier — the reference's ROADMAP beta target (98–99%).

Parity: ROADMAP.md:316-318 ("CNN architectures for MNIST") + the Conv2D dev
prototype. Conv(32)→Pool→Conv(64)→Pool→Flatten→Linear(128)→GELU→Linear(10),
NHWC throughout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from mila_tpu.nn import (
    Conv2D,
    Conv2DConfig,
    Flatten,
    Gelu,
    GeluConfig,
    Linear,
    LinearConfig,
    Pool2D,
    Pool2DConfig,
    Sequential,
)
from mila_tpu.nn.module import Lambda
from mila_tpu.utils.config import BaseConfig, ConfigError
from mila_tpu.utils.registry import models as _models


@dataclasses.dataclass(frozen=True)
class CNNClassifierConfig(BaseConfig):
    image_size: int = 28
    in_channels: int = 1
    conv_channels: tuple = (32, 64)
    hidden_dim: int = 128
    num_classes: int = 10
    param_dtype: str = "float32"

    def validate(self):
        if not self.conv_channels:
            raise ConfigError("need at least one conv layer")


class CNNClassifier(Sequential):
    """Input [B, H*W*C] (flat, like the MLP) or [B, H, W, C]."""

    def __init__(self, config: Optional[CNNClassifierConfig] = None):
        cfg = config or CNNClassifierConfig()
        cfg.validate()
        s = cfg.image_size
        layers = [
            (
                "reshape",
                Lambda(
                    lambda x, s=s, c=cfg.in_channels: x.reshape(-1, s, s, c),
                    name="reshape",
                ),
            )
        ]
        prev = cfg.in_channels
        size = s
        for i, ch in enumerate(cfg.conv_channels):
            layers.append(
                (
                    f"conv{i + 1}",
                    Conv2D(Conv2DConfig(name=f"conv{i + 1}", in_channels=prev,
                                        out_channels=ch, kernel_size=3,
                                        param_dtype=cfg.param_dtype)),
                )
            )
            layers.append((f"act{i + 1}", Gelu(GeluConfig())))
            layers.append((f"pool{i + 1}", Pool2D(Pool2DConfig(window=2))))
            prev = ch
            size //= 2
        layers.append(("flatten", Flatten()))
        flat = size * size * prev
        layers.append(
            ("fc1", Linear(LinearConfig(name="fc1", in_features=flat,
                                        out_features=cfg.hidden_dim,
                                        param_dtype=cfg.param_dtype)))
        )
        layers.append(("fc_act", Gelu(GeluConfig())))
        layers.append(
            ("head", Linear(LinearConfig(name="head", in_features=cfg.hidden_dim,
                                         out_features=cfg.num_classes,
                                         param_dtype=cfg.param_dtype)))
        )
        super().__init__(layers, cfg)

    def init(self, key, input_shape):
        cfg = self.config
        B = input_shape[0]
        # Shape propagation runs on the image view.
        return super().init(key, (B, cfg.image_size, cfg.image_size, cfg.in_channels))


_models.register("CNNClassifier", CNNClassifier)
