"""Autoregressive generation with KV cache.

The reference regenerates the full forward per token (Gpt2.cpp:182-190, no
KV cache — SURVEY.md §5). Here: one jitted prefill + one jitted decode step
re-used for every token; cache buffers are donated to avoid HBM copies.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mila_tpu.inference.sampling import SamplingConfig, sample_logits


class Generator:
    """Wraps a cache-capable model (``init_kv_cache`` +
    ``forward_with_cache``) for incremental decoding."""

    def __init__(self, model, params, max_len: int = 0, cache_dtype=None):
        self.model = model
        self.params = params
        self.max_len = max_len or model.config.max_seq_len
        self.cache_dtype = cache_dtype or jnp.dtype(model.config.param_dtype)
        self._decode_jit = None
        self._decode_cfg = None

    def _decode_step(self, params, token, cache, pos, key, cfg: SamplingConfig):
        logits, cache = self.model.forward_with_cache(params, token, cache, pos)
        # Restrict to the real vocabulary (Vp padding must never be sampled).
        logits = logits[:, -1, : self.model.config.vocab_size]
        nxt = sample_logits(logits, key, cfg)
        return nxt[:, None], cache

    def generate(
        self,
        prompt: jax.Array,
        max_new_tokens: int,
        key: Optional[jax.Array] = None,
        sampling: Optional[SamplingConfig] = None,
        eos_token: Optional[int] = None,
    ) -> jax.Array:
        """prompt [B, T0] int32 → [B, T0 + max_new_tokens] (stops early only
        by masking — shapes stay static for XLA)."""
        cfg = sampling or SamplingConfig(greedy=True)
        key = key if key is not None else jax.random.key(0)
        prompt = jnp.asarray(prompt, jnp.int32)
        B, T0 = prompt.shape
        if T0 + max_new_tokens > self.max_len:
            raise ValueError(
                f"prompt {T0} + new {max_new_tokens} exceeds cache {self.max_len}"
            )
        cache = self.model.init_kv_cache(B, self.max_len, self.cache_dtype)

        prefill = jax.jit(
            lambda p, t, c: self.model.forward_with_cache(p, t, c, 0)
        )
        logits, cache = prefill(self.params, prompt, cache)
        last_logits = logits[:, -1, : self.model.config.vocab_size]
        key, sub = jax.random.split(key)
        token = sample_logits(last_logits, sub, cfg)[:, None]

        if self._decode_jit is None or self._decode_cfg != cfg:
            # pos is a traced scalar so this compiles exactly once; the cache
            # is donated so decode updates it in place in HBM.
            self._decode_jit = jax.jit(
                functools.partial(self._decode_step, cfg=cfg),
                donate_argnums=(2,),
            )
            self._decode_cfg = cfg

        out = [prompt, token]
        done = jnp.zeros((B, 1), bool) if eos_token is not None else None
        for i in range(1, max_new_tokens):
            key, sub = jax.random.split(key)
            nxt, cache = self._decode_jit(
                self.params, token, cache, jnp.int32(T0 + i - 1), sub
            )
            if eos_token is not None:
                done = done | (token == eos_token)
                nxt = jnp.where(done, eos_token, nxt)
            token = nxt
            out.append(token)
        return jnp.concatenate(out, axis=1)
