"""Op library: pure-jnp reference implementations with manual VJPs.

Parity: reference layer 3 (SURVEY.md §2.3–2.5). These play the role Mila's
CPU ops play — golden implementations and the correctness oracle for the
Pallas kernels in :mod:`mila_tpu.kernels` — while already being TPU-fast
(XLA fuses them; matmuls hit the MXU). Each op registers in
``mila_tpu.utils.registry.operations`` under its reference OperationType name
(OperationType.ixx:21-30).
"""

from mila_tpu.ops.attention import (
    causal_mask,
    decode_attention,
    dot_product_attention,
    mha_qkv,
)
from mila_tpu.ops.cross_entropy import (
    cross_entropy_from_probs,
    softmax_cross_entropy,
    softmax_cross_entropy_ref,
)
from mila_tpu.ops.conv import avg_pool2d, conv2d, max_pool2d
from mila_tpu.ops.embedding import embedding_lookup, encoder
from mila_tpu.ops.gelu import gelu, gelu_exact, gelu_sigmoid, gelu_tanh
from mila_tpu.ops.layernorm import layer_norm, layer_norm_ref
from mila_tpu.ops.linear import linear, linear_gelu, linear_ref
from mila_tpu.ops.residual import residual
from mila_tpu.ops.rmsnorm import rms_norm, rms_norm_ref
from mila_tpu.ops.rope import apply_rope, apply_rope_interleaved, rope_cos_sin
from mila_tpu.ops.softmax import log_softmax, softmax
from mila_tpu.ops.swiglu import silu, swiglu

from mila_tpu.utils.registry import operations as _operations

# OperationRegistry parity: name → callable (OperationsRegistrar.ixx:50-69).
for _name, _fn in {
    "LinearOp": linear,
    "GeluOp": gelu,
    "LayerNormOp": layer_norm,
    "RMSNormOp": rms_norm,
    "AttentionOp": mha_qkv,
    "EncoderOp": encoder,
    "ResidualOp": residual,
    "SoftmaxOp": softmax,
    "SoftmaxCrossEntropyOp": softmax_cross_entropy,
    "SwiGLUOp": swiglu,
    "RoPEOp": apply_rope,
    "FusedOp": linear_gelu,
    "Conv2DOp": conv2d,
}.items():
    if not _operations.contains(_name):
        _operations.register(_name, _fn)

__all__ = [
    "causal_mask",
    "decode_attention",
    "dot_product_attention",
    "mha_qkv",
    "cross_entropy_from_probs",
    "softmax_cross_entropy",
    "softmax_cross_entropy_ref",
    "embedding_lookup",
    "encoder",
    "gelu",
    "gelu_exact",
    "gelu_sigmoid",
    "gelu_tanh",
    "layer_norm",
    "layer_norm_ref",
    "linear",
    "linear_gelu",
    "linear_ref",
    "conv2d",
    "max_pool2d",
    "avg_pool2d",
    "residual",
    "rms_norm",
    "rms_norm_ref",
    "apply_rope",
    "apply_rope_interleaved",
    "rope_cos_sin",
    "log_softmax",
    "softmax",
    "silu",
    "swiglu",
]
