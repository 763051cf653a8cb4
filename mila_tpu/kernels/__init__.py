"""Pallas TPU kernels — the native compute path.

Parity: reference §2.5 CUDA kernels; each has a jnp oracle in
:mod:`mila_tpu.ops` / :mod:`mila_tpu.inference.quantize` and is validated
against it in tests/kernels/.
"""

from mila_tpu.kernels.flash_attention import flash_attention, flash_mha_qkv
from mila_tpu.kernels.fused_adamw import fused_adamw_update
from mila_tpu.kernels.quant_matmul import quant_linear
from mila_tpu.kernels.softmax_ce import fused_softmax_cross_entropy

__all__ = [
    "flash_attention",
    "flash_mha_qkv",
    "fused_adamw_update",
    "quant_linear",
    "fused_softmax_cross_entropy",
]
