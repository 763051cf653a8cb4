"""Concrete NN layers: Linear, Gelu, LayerNorm, RMSNorm, Attention, Encoder,
Residual, Softmax, Dropout, losses.

Parity: reference §2.6 components (Components/Layers/Linear.ixx:61,
Activations/Gelu.ixx, Normalization/LayerNorm.ixx, Layers/Attention.ixx:61,
Layers/Encoder.ixx:63, Connections/Residual.ixx, Losses/Softmax.ixx,
Losses/SoftmaxCrossEntropy.ixx:52, Regularization/Dropout.ixx). Each layer is
a thin config-validated wrapper binding the op library into the module system;
weights initialize on device (the reference host-generates then copies H2D).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from mila_tpu import ops
from mila_tpu.nn.module import Module, Params
from mila_tpu.tensor import init as tinit
from mila_tpu.utils.config import BaseConfig, ConfigError
from mila_tpu.utils.rng import split_named


# --------------------------------------------------------------------------
# Linear (Components/Layers/Linear.ixx:61 + LinearConfig.ixx)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LinearConfig(BaseConfig):
    in_features: int = 0
    out_features: int = 0
    has_bias: bool = True
    initializer: str = "xavier_uniform"
    param_dtype: str = "float32"

    def validate(self):
        if self.in_features <= 0 or self.out_features <= 0:
            raise ConfigError(
                f"Linear needs positive dims, got in={self.in_features} out={self.out_features}"
            )
        if self.initializer not in tinit.INITIALIZERS:
            raise ConfigError(f"unknown initializer '{self.initializer}'")


class Linear(Module):
    """y = x @ w (+ b); weight layout [in, out] (MXU-direct; the reference
    stores [out, in], Linear.ixx:640)."""

    def __init__(self, config: LinearConfig):
        super().__init__(config)

    def init(self, key, input_shape):
        cfg: LinearConfig = self.config
        if input_shape[-1] != cfg.in_features:
            raise ValueError(
                f"{self.name}: input last dim {input_shape[-1]} != in_features {cfg.in_features}"
            )
        dtype = jnp.dtype(cfg.param_dtype)
        init_fn = tinit.INITIALIZERS[cfg.initializer]
        ks = split_named(key, "weight", "bias")
        p: Params = {
            "weight": init_fn(ks["weight"], (cfg.in_features, cfg.out_features), dtype=dtype)
        }
        if cfg.has_bias:
            p["bias"] = tinit.zeros((cfg.out_features,), dtype=dtype)
        return p

    def apply(self, params, x, *, training=False, rngs=None):
        w = params["weight"]
        if type(w).__name__ == "QTensor":
            # Weight-only quantized path: Pallas dequant+matmul kernel
            # (quantize_model_params swaps weights in place — any model built
            # from Linear layers runs quantized without code changes).
            from mila_tpu.kernels.quant_matmul import quant_linear

            return quant_linear(x, w, params.get("bias"))
        return ops.linear(x, w, params.get("bias"))

    def output_shape(self, input_shape):
        return (*tuple(input_shape[:-1]), self.config.out_features)


# --------------------------------------------------------------------------
# Gelu (Components/Activations/Gelu.ixx + GeluConfig.ixx:41-44)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GeluConfig(BaseConfig):
    approximation: str = "tanh"  # exact | tanh | sigmoid

    def validate(self):
        from mila_tpu.ops.gelu import GELU_VARIANTS

        if self.approximation not in GELU_VARIANTS:
            raise ConfigError(f"unknown GELU approximation '{self.approximation}'")


class Gelu(Module):
    def __init__(self, config: Optional[GeluConfig] = None):
        super().__init__(config or GeluConfig())

    def apply(self, params, x, *, training=False, rngs=None):
        return ops.gelu(x, self.config.approximation)


# --------------------------------------------------------------------------
# LayerNorm / RMSNorm (Components/Normalization/LayerNorm.ixx)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LayerNormConfig(BaseConfig):
    features: int = 0
    eps: float = 1e-5
    param_dtype: str = "float32"

    def validate(self):
        if self.features <= 0:
            raise ConfigError("LayerNorm needs positive features")
        if self.eps <= 0:
            raise ConfigError("eps must be positive")


class LayerNorm(Module):
    def __init__(self, config: LayerNormConfig):
        super().__init__(config)

    def init(self, key, input_shape):
        cfg = self.config
        dtype = jnp.dtype(cfg.param_dtype)
        return {
            "gamma": tinit.ones((cfg.features,), dtype),
            "beta": tinit.zeros((cfg.features,), dtype),
        }

    def apply(self, params, x, *, training=False, rngs=None):
        return ops.layer_norm(x, params["gamma"], params["beta"], self.config.eps)


class RMSNorm(Module):
    """BASELINE extension (dev-branch capability)."""

    def __init__(self, config: LayerNormConfig):
        super().__init__(config)

    def init(self, key, input_shape):
        return {"gamma": tinit.ones((self.config.features,), jnp.dtype(self.config.param_dtype))}

    def apply(self, params, x, *, training=False, rngs=None):
        return ops.rms_norm(x, params["gamma"], self.config.eps)


# --------------------------------------------------------------------------
# Attention (Components/Layers/Attention.ixx:61 — fused-QKV contract)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AttentionConfig(BaseConfig):
    embedding_dim: int = 0
    num_heads: int = 0
    causal: bool = True
    impl: str = "auto"  # auto | xla | flash (Pallas kernel)

    def validate(self):
        if self.embedding_dim <= 0 or self.num_heads <= 0:
            raise ConfigError("Attention needs positive embedding_dim and num_heads")
        if self.embedding_dim % self.num_heads != 0:
            raise ConfigError(
                f"embedding_dim {self.embedding_dim} not divisible by num_heads {self.num_heads}"
            )


class Attention(Module):
    """Parameter-free causal MHA over fused QKV [B,T,3C] → [B,T,C]
    (the Mila Attention component contract, Attention.ixx:308-365)."""

    def __init__(self, config: AttentionConfig):
        super().__init__(config)

    def apply(self, params, x, *, training=False, rngs=None):
        cfg = self.config
        if x.shape[-1] != 3 * cfg.embedding_dim:
            raise ValueError(
                f"{self.name}: expected fused QKV last dim {3*cfg.embedding_dim}, got {x.shape[-1]}"
            )
        from mila_tpu.ops.attention import resolve_attention_impl

        if resolve_attention_impl(cfg.impl, seq_len=x.shape[1]) == "flash":
            from mila_tpu.kernels.flash_attention import flash_mha_qkv

            return flash_mha_qkv(x, cfg.num_heads, causal=cfg.causal)
        return ops.mha_qkv(x, cfg.num_heads, causal=cfg.causal)

    def output_shape(self, input_shape):
        return (*tuple(input_shape[:-1]), self.config.embedding_dim)


# --------------------------------------------------------------------------
# Encoder (Components/Layers/Encoder.ixx:63 — wte + wpe)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class EncoderConfig(BaseConfig):
    vocab_size: int = 0
    embedding_dim: int = 0
    max_seq_len: int = 0  # 0 = no positional table
    init_stddev: float = 0.02
    param_dtype: str = "float32"

    def validate(self):
        if self.vocab_size <= 0 or self.embedding_dim <= 0:
            raise ConfigError("Encoder needs positive vocab_size and embedding_dim")


class Encoder(Module):
    """Token (+ positional) embedding. Input is int token ids [B, T]."""

    def __init__(self, config: EncoderConfig):
        super().__init__(config)

    def init(self, key, input_shape):
        cfg = self.config
        dtype = jnp.dtype(cfg.param_dtype)
        ks = split_named(key, "wte", "wpe")
        p: Params = {
            "wte": tinit.normal(ks["wte"], (cfg.vocab_size, cfg.embedding_dim), cfg.init_stddev, dtype)
        }
        if cfg.max_seq_len > 0:
            p["wpe"] = tinit.normal(
                ks["wpe"], (cfg.max_seq_len, cfg.embedding_dim), cfg.init_stddev, dtype
            )
        return p

    def apply(self, params, tokens, *, training=False, rngs=None):
        return ops.encoder(tokens, params["wte"], params.get("wpe"))

    def output_shape(self, input_shape):
        return (*tuple(input_shape), self.config.embedding_dim)


# --------------------------------------------------------------------------
# Residual / Softmax / Dropout
# --------------------------------------------------------------------------

class Residual(Module):
    """Wraps an inner module: y = x + inner(x) (Connections/Residual.ixx;
    the reference uses an explicit binary add component — here the skip
    connection is structural)."""

    def __init__(self, inner: Module, name: str = ""):
        super().__init__(BaseConfig(name=name or f"residual_{inner.name}"))
        self.inner = inner

    def init(self, key, input_shape):
        return {"inner": self.inner.init(key, input_shape)}

    def apply(self, params, x, *, training=False, rngs=None):
        return ops.residual(self.inner.apply(params["inner"], x, training=training, rngs=rngs), x)


@dataclasses.dataclass(frozen=True)
class SoftmaxConfig(BaseConfig):
    axis: int = -1


class Softmax(Module):
    def __init__(self, config: Optional[SoftmaxConfig] = None):
        super().__init__(config or SoftmaxConfig())

    def apply(self, params, x, *, training=False, rngs=None):
        return ops.softmax(x, self.config.axis)


@dataclasses.dataclass(frozen=True)
class DropoutConfig(BaseConfig):
    rate: float = 0.1

    def validate(self):
        if not 0.0 <= self.rate < 1.0:
            raise ConfigError(f"dropout rate must be in [0,1), got {self.rate}")


class Dropout(Module):
    """Inverted dropout; active only when training and a 'dropout' rng is
    provided (fixes the reference's stale Dropout, Regularization/Dropout.ixx)."""

    def __init__(self, config: Optional[DropoutConfig] = None):
        super().__init__(config or DropoutConfig())

    def apply(self, params, x, *, training=False, rngs=None):
        rate = self.config.rate
        if not training or rate == 0.0:
            return x
        if rngs is None or "dropout" not in rngs:
            raise ValueError("Dropout in training mode needs rngs={'dropout': key}")
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rngs["dropout"], keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# --------------------------------------------------------------------------
# Losses (Components/Losses/SoftmaxCrossEntropy.ixx:52)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SoftmaxCrossEntropyConfig(BaseConfig):
    ignore_index: int = -100
    reduction: str = "mean"  # mean | sum | none

    def validate(self):
        if self.reduction not in ("mean", "sum", "none"):
            raise ConfigError(f"unknown reduction '{self.reduction}'")


class SoftmaxCrossEntropy(Module):
    """Fused softmax+CE loss: apply(params, logits, targets=...) → loss."""

    def __init__(self, config: Optional[SoftmaxCrossEntropyConfig] = None):
        super().__init__(config or SoftmaxCrossEntropyConfig())

    def apply(self, params, logits, *, targets=None, training=False, rngs=None):
        if targets is None:
            raise ValueError("SoftmaxCrossEntropy.apply needs targets=")
        cfg = self.config
        loss = ops.softmax_cross_entropy(logits, targets, cfg.ignore_index)
        if cfg.reduction == "none":
            return loss
        if cfg.reduction == "sum":
            return loss.sum()
        # mean over non-ignored rows
        valid = (targets != cfg.ignore_index).astype(jnp.float32)
        return loss.sum() / jnp.maximum(valid.sum(), 1.0)
