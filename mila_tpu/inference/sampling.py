"""Token sampling: greedy, temperature, top-k, top-p, CDF multinomial.

Parity: reference ``sampleMult`` CDF sampling over probabilities
(Gpt2Model.ixx:557-583). TPU-native: sampling runs on device inside the
jitted decode step (the reference samples on host from copied probs).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    temperature: float = 1.0
    top_k: int = 0  # 0 = off
    top_p: float = 1.0  # 1 = off
    greedy: bool = False


def sample_mult(probs: jax.Array, key: jax.Array) -> jax.Array:
    """CDF multinomial sampling (sampleMult parity). probs: [..., V] → [...] int32."""
    cdf = jnp.cumsum(probs, axis=-1)
    u = jax.random.uniform(key, probs.shape[:-1] + (1,), dtype=probs.dtype)
    # First index where cdf > u (coin >= cdf[j] keeps scanning in the ref).
    return jnp.sum((cdf < u).astype(jnp.int32), axis=-1)


def sample_logits(
    logits: jax.Array,
    key: jax.Array,
    config: Optional[SamplingConfig] = None,
) -> jax.Array:
    """Sample token ids from raw logits [..., V] → [...] int32."""
    cfg = config or SamplingConfig()
    if cfg.greedy or cfg.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = logits.astype(jnp.float32) / jnp.maximum(cfg.temperature, 1e-6)
    if cfg.top_k > 0 and cfg.top_k < x.shape[-1]:
        kth = jnp.sort(x, axis=-1)[..., -cfg.top_k][..., None]
        x = jnp.where(x < kth, -jnp.inf, x)
    if cfg.top_p < 1.0:
        sorted_x = jnp.sort(x, axis=-1)[..., ::-1]
        probs_sorted = jax.nn.softmax(sorted_x, axis=-1)
        cum = jnp.cumsum(probs_sorted, axis=-1)
        # Keep the smallest set with cumulative prob ≥ top_p (always ≥1 token).
        keep_sorted = cum - probs_sorted < cfg.top_p
        kth_val = jnp.min(
            jnp.where(keep_sorted, sorted_x, jnp.inf), axis=-1, keepdims=True
        )
        x = jnp.where(x < kth_val, -jnp.inf, x)
    probs = jax.nn.softmax(x, axis=-1)
    return sample_mult(probs, key).astype(jnp.int32)
