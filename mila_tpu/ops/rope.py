"""Rotary position embeddings (RoPE).

Not in the reference snapshot (dev-branch capability, README.md:5-13);
required by BASELINE for the Llama-3.2 stack. Implemented in the HF/Llama
convention: head dims are split in halves (x1 = x[..., :d/2], x2 = x[..., d/2:])
and rotated by position-dependent angles; frequency scaling hooks support
Llama-3's rope-scaling config.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rope_frequencies(
    head_dim: int,
    theta: float = 10000.0,
    scaling: Optional[dict] = None,
) -> jax.Array:
    """Inverse frequencies [head_dim/2], with optional Llama-3 scaling."""
    inv = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if scaling and scaling.get("rope_type") in ("llama3",):
        # Llama-3.x frequency smoothing (matches HF modeling_rope_utils).
        factor = scaling.get("factor", 8.0)
        low_factor = scaling.get("low_freq_factor", 1.0)
        high_factor = scaling.get("high_freq_factor", 4.0)
        old_len = scaling.get("original_max_position_embeddings", 8192)
        wavelen = 2.0 * jnp.pi / inv
        low_wl = old_len / low_factor
        high_wl = old_len / high_factor
        smooth = (old_len / wavelen - low_factor) / (high_factor - low_factor)
        scaled = jnp.where(wavelen > low_wl, inv / factor, inv)
        smoothed = (1 - smooth) * inv / factor + smooth * inv
        is_medium = (wavelen <= low_wl) & (wavelen >= high_wl)
        inv = jnp.where(is_medium, smoothed, scaled)
    return inv


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float = 10000.0, scaling=None, dtype=jnp.float32
) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for given positions: each [..., T, head_dim/2]."""
    inv = rope_frequencies(head_dim, theta, scaling)
    angles = positions.astype(jnp.float32)[..., None] * inv  # [..., T, d/2]
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate head vectors. x: [..., T, n_heads, head_dim]; cos/sin: [..., T, d/2].

    Split-half convention (HF Llama): (x1, x2) → (x1·cos − x2·sin, x2·cos + x1·sin).
    """
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    # cos/sin broadcast over the heads axis: [..., T, 1, d/2].
    c = cos[..., None, :].astype(jnp.float32)
    s = sin[..., None, :].astype(jnp.float32)
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate([x1f * c - x2f * s, x2f * c + x1f * s], axis=-1)
    return out.astype(x.dtype)


def apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """GPT-NeoX interleaved convention: pairs (x[2i], x[2i+1]) rotated."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[..., None, :].astype(jnp.float32)
    s = sin[..., None, :].astype(jnp.float32)
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    r1 = x1f * c - x2f * s
    r2 = x2f * c + x1f * s
    out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)
