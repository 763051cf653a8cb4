"""NN component layer: module system, layers, blocks.

Parity: reference layers 4 (SURVEY.md §2.6): Core/Component.ixx,
Core/CompositeComponent.ixx, Components/*.
"""

from mila_tpu.nn.blocks import (
    MLP,
    MLPConfig,
    TransformerBlock,
    TransformerBlockConfig,
)
from mila_tpu.nn.layers import (
    Attention,
    AttentionConfig,
    Dropout,
    DropoutConfig,
    Encoder,
    EncoderConfig,
    Gelu,
    GeluConfig,
    LayerNorm,
    LayerNormConfig,
    Linear,
    LinearConfig,
    Residual,
    RMSNorm,
    Softmax,
    SoftmaxConfig,
    SoftmaxCrossEntropy,
    SoftmaxCrossEntropyConfig,
)
from mila_tpu.nn.conv import Conv2D, Conv2DConfig, Flatten, Pool2D, Pool2DConfig
from mila_tpu.nn.module import (
    CompositeModule,
    Lambda,
    Module,
    Params,
    Sequential,
)

__all__ = [
    "MLP",
    "MLPConfig",
    "TransformerBlock",
    "TransformerBlockConfig",
    "Attention",
    "AttentionConfig",
    "Dropout",
    "DropoutConfig",
    "Encoder",
    "EncoderConfig",
    "Gelu",
    "GeluConfig",
    "LayerNorm",
    "LayerNormConfig",
    "Linear",
    "LinearConfig",
    "Residual",
    "RMSNorm",
    "Softmax",
    "SoftmaxConfig",
    "SoftmaxCrossEntropy",
    "SoftmaxCrossEntropyConfig",
    "CompositeModule",
    "Lambda",
    "Module",
    "Params",
    "Sequential",
    "Conv2D",
    "Conv2DConfig",
    "Flatten",
    "Pool2D",
    "Pool2DConfig",
]
