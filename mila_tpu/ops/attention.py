"""Attention ops: causal multi-head attention (fused-QKV convention) and
general grouped-query attention — reference jnp implementations.

Parity: reference ``CpuAttentionOp.ixx:59-218`` (causal MHA from fused QKV
``[B,T,3C]``: QK^T·scale, causal mask + row softmax, ·V) and the CUDA pipeline
``Kernels/CudaMHA.cu:29-80`` (permute → strided-batched QK^T → fused
scale+causal-softmax → AV → unpermute). TPU-native redesign: no permute
kernels — einsum contractions keep the MXU busy directly and XLA handles
layout; GQA (dev-branch/BASELINE capability) is an extra head-group axis on
the same einsum. The Pallas flash-attention kernel
(:mod:`mila_tpu.kernels.flash_attention`) is a drop-in replacement for
:func:`dot_product_attention`; this module is its correctness oracle.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative mask value, safe in bf16/f32

# Full-precision passes for f32 score matmuls (reference computes exact FP32);
# bf16 inputs hit the MXU natively regardless.
_PRECISION = jax.lax.Precision.HIGHEST


# Measured v5e crossover (benchmarks + TPU probes): XLA's fused attention
# wins below ~2k tokens; flash wins 2.9-4.3x at 2048-4096 (fwd+bwd).
FLASH_MIN_SEQ = 2048


def resolve_attention_impl(impl: str = "auto", seq_len: int = 0) -> str:
    """Resolve an attention backend name: 'auto' → Pallas flash attention on
    accelerators for long sequences, plain XLA otherwise."""
    if impl == "auto":
        if jax.default_backend() == "cpu":
            return "xla"
        return "flash" if (seq_len == 0 or seq_len >= FLASH_MIN_SEQ) else "xla"
    if impl not in ("xla", "flash"):
        raise ValueError(f"unknown attention impl '{impl}'")
    return impl


def attention(q, k, v, *, impl: str = "auto", **kw):
    """Backend-dispatching attention (models route through this; the pure
    jnp `dot_product_attention` below stays the test oracle)."""
    if resolve_attention_impl(impl, seq_len=k.shape[1]) == "flash":
        from mila_tpu.kernels.flash_attention import flash_attention

        return flash_attention(q, k, v, **kw)
    return dot_product_attention(q, k, v, **kw)


def causal_mask(t_q: int, t_kv: int, offset: int = 0) -> jax.Array:
    """[t_q, t_kv] boolean mask; True = attend. Query i sees keys ≤ i+offset."""
    qi = jax.lax.broadcasted_iota(jnp.int32, (t_q, t_kv), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (t_q, t_kv), 1)
    return kj <= qi + offset


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,
    kv_offset: int = 0,
) -> jax.Array:
    """General (G)QA attention.

    q: [B, Tq, NH, HS]; k, v: [B, Tkv, NKV, HS] with NH % NKV == 0.
    Returns [B, Tq, NH, HS]. Softmax statistics in f32 (matching the
    reference's fp32 softmax, CudaMHA.cu:68). ``kv_offset`` shifts the causal
    diagonal for decode steps where Tq < Tkv (query i is absolute position
    kv_offset + i).
    """
    B, Tq, NH, HS = q.shape
    _, Tkv, NKV, _ = k.shape
    if NH % NKV != 0:
        raise ValueError(f"num_heads {NH} not divisible by num_kv_heads {NKV}")
    group = NH // NKV
    scale = 1.0 / math.sqrt(HS) if scale is None else scale
    if jax.default_backend() == "cpu" and jnp.bfloat16 in (q.dtype, k.dtype):
        # CPU oracle: XLA's CPU DotThunk can't execute bf16 x bf16 -> f32
        # contractions it fails to rewrite (seen with transposed KV layouts);
        # upcast — the oracle is about values, not dtype flow.
        out = dot_product_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), causal=causal, scale=scale, mask=mask,
            kv_offset=kv_offset,
        )
        return out.astype(q.dtype)

    qg = q.reshape(B, Tq, NKV, group, HS)
    # scores: [B, NKV, group, Tq, Tkv]
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k,
        preferred_element_type=jnp.float32, precision=_PRECISION,
    ) * scale
    if causal:
        cm = causal_mask(Tq, Tkv, offset=kv_offset)
        scores = jnp.where(cm[None, None, None], scores, NEG_INF)
    if mask is not None:
        # mask: broadcastable to [B, Tq, Tkv]; True = attend.
        scores = jnp.where(mask[:, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32, precision=_PRECISION,
    )
    return out.reshape(B, Tq, NH, HS).astype(q.dtype)


def mha_qkv(
    qkv: jax.Array,
    num_heads: int,
    *,
    causal: bool = True,
    scale: Optional[float] = None,
) -> jax.Array:
    """Causal MHA from fused QKV — the Mila component contract.

    qkv: [B, T, 3C] (concatenated Q|K|V, C = num_heads·head_size) → [B, T, C].
    Parity: ``CpuAttentionOp::forward`` (CpuAttentionOp.ixx:130-218) /
    ``Attention`` component shape contract (Components/Layers/Attention.ixx:308).
    """
    B, T, C3 = qkv.shape
    if C3 % 3 != 0:
        raise ValueError(f"fused QKV last dim {C3} not divisible by 3")
    C = C3 // 3
    if C % num_heads != 0:
        raise ValueError(f"embedding dim {C} not divisible by num_heads {num_heads}")
    HS = C // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, num_heads, HS)
    k = k.reshape(B, T, num_heads, HS)
    v = v.reshape(B, T, num_heads, HS)
    out = dot_product_attention(q, k, v, causal=causal, scale=scale)
    return out.reshape(B, T, C)


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    cache_len: jax.Array,
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Single-step decode attention over a (contiguous) KV cache.

    q: [B, 1, NH, HS]; k_cache/v_cache: [B, maxT, NKV, HS]; cache_len: [B]
    number of valid cache entries *including* the current token. Positions
    ≥ cache_len are masked. (The reference has no KV cache at all —
    generation re-runs the full forward per token, Gpt2.cpp:182-190; this is
    the TPU-native fix.)
    """
    B, _, NH, HS = q.shape
    maxT = k_cache.shape[1]
    scale = 1.0 / math.sqrt(HS) if scale is None else scale
    if jax.default_backend() == "cpu" and jnp.bfloat16 in (
        q.dtype, k_cache.dtype
    ):
        # See dot_product_attention: CPU bf16 dot thunk limitation.
        return decode_attention(
            q.astype(jnp.float32), k_cache.astype(jnp.float32),
            v_cache.astype(jnp.float32), cache_len, scale=scale,
        ).astype(q.dtype)
    NKV = k_cache.shape[2]
    group = NH // NKV
    qg = q.reshape(B, 1, NKV, group, HS)
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k_cache,
        preferred_element_type=jnp.float32, precision=_PRECISION,
    ) * scale
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, maxT), 1)
    valid = pos < cache_len[:, None]  # [B, maxT]
    scores = jnp.where(valid[:, None, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs.astype(v_cache.dtype), v_cache,
        preferred_element_type=jnp.float32, precision=_PRECISION,
    )
    return out.reshape(B, 1, NH, HS).astype(q.dtype)
