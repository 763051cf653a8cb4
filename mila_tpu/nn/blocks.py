"""Composite blocks: MLP and pre-LN Transformer block.

Parity: reference ``Components/Blocks/MLP.ixx:66`` (Linear→[LayerNorm?]→Gelu→
Linear) and ``Components/Blocks/Transformer.ixx:60`` (pre-LN GPT-2 block:
LN1→QKV Linear→Attention→Residual→LN2→MLP→Residual, fwd :108-139, backward
chain :154-214 — here the chain is jax.grad through the ops' manual VJPs).
The Llama-style block (RMSNorm/RoPE/GQA/SwiGLU — BASELINE extensions) lives
with the Llama model in :mod:`mila_tpu.models.llama`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from mila_tpu import ops
from mila_tpu.nn.layers import (
    Attention,
    AttentionConfig,
    Dropout,
    DropoutConfig,
    Gelu,
    GeluConfig,
    LayerNorm,
    LayerNormConfig,
    Linear,
    LinearConfig,
)
from mila_tpu.nn.module import CompositeModule, Params
from mila_tpu.utils.config import BaseConfig, ConfigError
from mila_tpu.utils.rng import split_named


@dataclasses.dataclass(frozen=True)
class MLPConfig(BaseConfig):
    in_features: int = 0
    hidden_features: int = 0
    out_features: int = 0  # 0 → same as in_features
    has_bias: bool = True
    use_layernorm: bool = False
    activation: str = "tanh"  # GELU approximation
    dropout: float = 0.0
    param_dtype: str = "float32"

    def validate(self):
        if self.in_features <= 0 or self.hidden_features <= 0:
            raise ConfigError("MLP needs positive in/hidden features")


class MLP(CompositeModule):
    """Linear→[LayerNorm?]→Gelu→Linear (MLP.ixx:66 parity)."""

    def __init__(self, config: MLPConfig):
        super().__init__(config)
        cfg = config
        out = cfg.out_features or cfg.in_features
        self.add(
            "fc1",
            Linear(
                LinearConfig(
                    name="fc1",
                    in_features=cfg.in_features,
                    out_features=cfg.hidden_features,
                    has_bias=cfg.has_bias,
                    param_dtype=cfg.param_dtype,
                )
            ),
        )
        if cfg.use_layernorm:
            self.add("ln", LayerNorm(LayerNormConfig(name="ln", features=cfg.hidden_features)))
        self.add("act", Gelu(GeluConfig(name="act", approximation=cfg.activation)))
        if cfg.dropout > 0:
            self.add("drop", Dropout(DropoutConfig(name="drop", rate=cfg.dropout)))
        self.add(
            "fc2",
            Linear(
                LinearConfig(
                    name="fc2",
                    in_features=cfg.hidden_features,
                    out_features=out,
                    has_bias=cfg.has_bias,
                    param_dtype=cfg.param_dtype,
                )
            ),
        )

    def apply(self, params, x, *, training=False, rngs=None):
        for name, child in self.children():
            x = child.apply(params.get(name, {}), x, training=training, rngs=rngs)
        return x


@dataclasses.dataclass(frozen=True)
class TransformerBlockConfig(BaseConfig):
    embedding_dim: int = 0
    num_heads: int = 0
    mlp_ratio: int = 4
    dropout: float = 0.0
    param_dtype: str = "float32"
    # Rematerialize the block under jax.grad: trade recompute for HBM
    # (jax.checkpoint — the standard TPU memory lever for deep stacks).
    remat: bool = False
    attention_impl: str = "auto"  # auto | xla | flash

    def validate(self):
        if self.embedding_dim <= 0 or self.num_heads <= 0:
            raise ConfigError("TransformerBlock needs positive dims")
        if self.embedding_dim % self.num_heads != 0:
            raise ConfigError("embedding_dim must divide by num_heads")


class TransformerBlock(CompositeModule):
    """Pre-LN GPT-2 block (Transformer.ixx:108-139 parity):

    x ← x + proj(attn(qkv(ln1(x))));  x ← x + mlp(ln2(x))
    """

    def __init__(self, config: TransformerBlockConfig):
        super().__init__(config)
        cfg = config
        C = cfg.embedding_dim
        self.add("ln1", LayerNorm(LayerNormConfig(name="ln1", features=C)))
        self.add(
            "qkv",
            Linear(LinearConfig(name="qkv", in_features=C, out_features=3 * C,
                                param_dtype=cfg.param_dtype)),
        )
        self.add(
            "attn",
            Attention(
                AttentionConfig(
                    name="attn", embedding_dim=C, num_heads=cfg.num_heads,
                    impl=cfg.attention_impl,
                )
            ),
        )
        self.add(
            "proj",
            Linear(LinearConfig(name="proj", in_features=C, out_features=C,
                                param_dtype=cfg.param_dtype)),
        )
        self.add("ln2", LayerNorm(LayerNormConfig(name="ln2", features=C)))
        self.add(
            "mlp",
            MLP(
                MLPConfig(
                    name="mlp",
                    in_features=C,
                    hidden_features=cfg.mlp_ratio * C,
                    out_features=C,
                    dropout=cfg.dropout,
                    param_dtype=cfg.param_dtype,
                )
            ),
        )

    def apply(self, params, x, *, training=False, rngs=None):
        def body(params, x):
            h = self.get("ln1").apply(params["ln1"], x)
            h = self.get("qkv").apply(params["qkv"], h)
            h = self.get("attn").apply({}, h)
            h = self.get("proj").apply(params["proj"], h)
            x = ops.residual(h, x)
            h = self.get("ln2").apply(params["ln2"], x)
            h = self.get("mlp").apply(params["mlp"], h, training=training, rngs=rngs)
            return ops.residual(h, x)

        if self.config.remat and training:
            import jax

            return jax.checkpoint(body)(params, x)
        return body(params, x)

    def output_shape(self, input_shape):
        return tuple(input_shape)
