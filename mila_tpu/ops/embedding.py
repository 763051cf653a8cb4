"""Embedding encoder: token + positional embedding lookup with manual VJP.

Parity: reference ``CpuEncoderOp.ixx`` (wte[token] + wpe[pos] add) and CUDA
kernels ``Kernels/CudaEncoder.cu:37`` (float4-vectorized). The backward has no
input gradient — token ids are integers (Encoder.ixx:191-196); the weight
gradients are scatter-adds, which XLA lowers to efficient TPU sorted-segment
sums.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


@jax.custom_vjp
def encoder(tokens: jax.Array, wte: jax.Array, wpe: Optional[jax.Array]) -> jax.Array:
    """tokens: [B, T] int; wte: [V, C]; wpe: [maxT, C] or None → [B, T, C]."""
    x = jnp.take(wte, tokens, axis=0)
    if wpe is not None:
        T = tokens.shape[-1]
        x = x + wpe[:T][None, :, :]
    return x


def _enc_fwd(tokens, wte, wpe):
    return encoder(tokens, wte, wpe), (tokens, wte.shape, None if wpe is None else wpe.shape)


def _enc_bwd(res, g):
    tokens, wte_shape, wpe_shape = res
    V, C = wte_shape
    g32 = g.astype(jnp.float32)
    flat_tokens = tokens.reshape(-1)
    flat_g = g32.reshape(-1, C)
    # dWte[v] += Σ_{i: tokens[i]=v} g[i] — scatter-add (segment sum).
    dwte = jax.ops.segment_sum(flat_g, flat_tokens, num_segments=V).astype(g.dtype)
    if wpe_shape is None:
        return None, dwte, None
    maxT = wpe_shape[0]
    T = tokens.shape[-1]
    # dWpe[t] += Σ_b g[b, t]; positions beyond T get zero.
    dwpe_t = g32.sum(axis=tuple(range(g32.ndim - 2)))  # [T, C]
    dwpe = jnp.zeros((maxT, C), jnp.float32).at[:T].set(dwpe_t).astype(g.dtype)
    return None, dwte, dwpe


encoder.defvjp(_enc_fwd, _enc_bwd)


def embedding_lookup(tokens: jax.Array, table: jax.Array) -> jax.Array:
    """Plain table lookup (no positions); differentiable via jnp.take."""
    return jnp.take(table, tokens, axis=0)
