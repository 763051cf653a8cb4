"""GPT-2 model: encoder + N transformer blocks + final LN + LM head, with
KV-cache generation.

Parity: reference ``Gpt2Model`` (Samples/Gpt2/Src/Gpt2Model.ixx:127-144:
Encoder + N×Transformer + LayerNorm + Linear(lm_head) + Softmax; llm.c
checkpoint ingestion :164-196; ``sampleMult`` CDF sampling :557-583) and
``CharTransformer`` (Samples/CharLM/Src/CharTransformer.ixx:34-43,129-141 —
the same architecture at char scale, so this class covers both workloads).
TPU-native upgrades over the reference: a KV cache (the reference re-runs the
full forward per generated token, Gpt2.cpp:182-190), weight tying option, and
single-program jitted decode steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from mila_tpu import ops
from mila_tpu.nn import (
    Encoder,
    EncoderConfig,
    LayerNorm,
    LayerNormConfig,
    Linear,
    LinearConfig,
    TransformerBlock,
    TransformerBlockConfig,
)
from mila_tpu.nn.module import CompositeModule, Params
from mila_tpu.utils.config import BaseConfig, ConfigError
from mila_tpu.utils.registry import models as _models
from mila_tpu.utils.rng import split_named


@dataclasses.dataclass(frozen=True)
class GPT2Config(BaseConfig):
    """Architecture config (mirrors the llm.c header fields the reference
    reads: maxT/V/Vp/L/NH/C, Gpt2Model.ixx:164-196)."""

    vocab_size: int = 50257
    padded_vocab_size: int = 0  # 0 → round up to multiple of 128 (TPU lanes)
    max_seq_len: int = 1024
    num_layers: int = 12
    num_heads: int = 12
    embedding_dim: int = 768
    mlp_ratio: int = 4
    dropout: float = 0.0
    tie_embeddings: bool = True
    param_dtype: str = "float32"
    remat: bool = False
    attention_impl: str = "auto"  # auto | xla | flash

    def validate(self):
        if min(self.vocab_size, self.max_seq_len, self.num_layers,
               self.num_heads, self.embedding_dim) <= 0:
            raise ConfigError("all GPT2 dims must be positive")
        if self.embedding_dim % self.num_heads != 0:
            raise ConfigError("embedding_dim must divide num_heads")

    @property
    def vp(self) -> int:
        """Padded vocab (lane-aligned for the MXU, like llm.c's Vp)."""
        if self.padded_vocab_size:
            return self.padded_vocab_size
        return ((self.vocab_size + 127) // 128) * 128

    @staticmethod
    def gpt2_124m() -> "GPT2Config":
        return GPT2Config(name="gpt2-124M")

    @staticmethod
    def char_lm(vocab_size: int = 256) -> "GPT2Config":
        """CharTransformerConfig parity (vocab 256 / C 256 / mlp 1024)."""
        return GPT2Config(
            name="char-lm",
            vocab_size=vocab_size,
            padded_vocab_size=max(128, ((vocab_size + 127) // 128) * 128),
            max_seq_len=256,
            num_layers=4,
            num_heads=8,
            embedding_dim=256,
            mlp_ratio=4,
        )


class GPT2(CompositeModule):
    def __init__(self, config: GPT2Config):
        super().__init__(config)
        cfg = config
        C = cfg.embedding_dim
        self.add(
            "encoder",
            Encoder(
                EncoderConfig(
                    name="encoder",
                    vocab_size=cfg.vp,
                    embedding_dim=C,
                    max_seq_len=cfg.max_seq_len,
                    param_dtype=cfg.param_dtype,
                )
            ),
        )
        for i in range(cfg.num_layers):
            self.add(
                f"h{i}",
                TransformerBlock(
                    TransformerBlockConfig(
                        name=f"h{i}",
                        embedding_dim=C,
                        num_heads=cfg.num_heads,
                        mlp_ratio=cfg.mlp_ratio,
                        dropout=cfg.dropout,
                        param_dtype=cfg.param_dtype,
                        remat=cfg.remat,
                        attention_impl=cfg.attention_impl,
                    )
                ),
            )
        self.add("ln_f", LayerNorm(LayerNormConfig(name="ln_f", features=C)))
        if not cfg.tie_embeddings:
            self.add(
                "lm_head",
                Linear(
                    LinearConfig(
                        name="lm_head", in_features=C, out_features=cfg.vp,
                        has_bias=False, param_dtype=cfg.param_dtype,
                    )
                ),
            )

    def init(self, key, input_shape) -> Params:
        ks = split_named(key, *[n for n, _ in self.children()])
        params: Params = {}
        B, T = input_shape
        params["encoder"] = self.get("encoder").init(ks["encoder"], (B, T))
        shape = (B, T, self.config.embedding_dim)
        for name, child in self.children():
            if name == "encoder":
                continue
            params[name] = child.init(ks[name], shape)
        return params

    def apply(self, params, tokens, *, training=False, rngs=None) -> jax.Array:
        """tokens [B,T] → logits [B,T,Vp] (Gpt2Model::forward parity)."""
        cfg: GPT2Config = self.config
        x = self.get("encoder").apply(params["encoder"], tokens)
        for i in range(cfg.num_layers):
            x = self.get(f"h{i}").apply(params[f"h{i}"], x, training=training, rngs=rngs)
        x = self.get("ln_f").apply(params["ln_f"], x)
        return self._logits(params, x)

    def _logits(self, params, x):
        if self.config.tie_embeddings:
            # lm_head = wte^T (GPT-2 weight tying; llm.c does the same).
            return ops.linear(x, params["encoder"]["wte"].T, None)
        return self.get("lm_head").apply(params["lm_head"], x)

    def output_shape(self, input_shape):
        return (*tuple(input_shape), self.config.vp)

    # ------------------------------------------------------------------
    # KV-cache decode path (absent in the reference — SURVEY.md §5
    # "no KV cache anywhere"; TPU-native addition)
    # ------------------------------------------------------------------

    def init_kv_cache(self, batch_size: int, max_len: int = 0, dtype=jnp.float32) -> dict:
        cfg: GPT2Config = self.config
        maxT = max_len or cfg.max_seq_len
        HS = cfg.embedding_dim // cfg.num_heads
        return {
            f"h{i}": {
                "k": jnp.zeros((batch_size, maxT, cfg.num_heads, HS), dtype),
                "v": jnp.zeros((batch_size, maxT, cfg.num_heads, HS), dtype),
            }
            for i in range(cfg.num_layers)
        }

    def _block_step(self, blk_params, blk: TransformerBlock, x, cache, pos):
        """One transformer block over new tokens x [B,t,C] using+updating cache.

        ``pos`` is the number of tokens already in the cache (scalar int).
        """
        cfg: GPT2Config = self.config
        B, t, C = x.shape
        NH = cfg.num_heads
        HS = C // NH
        h = blk.get("ln1").apply(blk_params["ln1"], x)
        qkv = blk.get("qkv").apply(blk_params["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, t, NH, HS)
        k = k.reshape(B, t, NH, HS)
        v = v.reshape(B, t, NH, HS)
        k_cache = jax.lax.dynamic_update_slice(
            cache["k"], k.astype(cache["k"].dtype), (0, pos, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            cache["v"], v.astype(cache["v"].dtype), (0, pos, 0, 0)
        )
        total = pos + t
        lens = jnp.full((B,), total, jnp.int32)
        if t == 1:
            att = ops.decode_attention(q, k_cache, v_cache, lens)
        else:
            # Prefill: causal over the cache with offset = pos.
            maxT = k_cache.shape[1]
            pos_ids = jax.lax.broadcasted_iota(jnp.int32, (t, maxT), 1)
            qi = jax.lax.broadcasted_iota(jnp.int32, (t, maxT), 0) + pos
            mask = (pos_ids <= qi)[None]  # [1, t, maxT]
            att = ops.dot_product_attention(
                q, k_cache, v_cache, causal=False, mask=mask.repeat(B, 0)
            )
        att = att.reshape(B, t, C)
        h = blk.get("proj").apply(blk_params["proj"], att)
        x = ops.residual(h, x)
        h = blk.get("ln2").apply(blk_params["ln2"], x)
        h = blk.get("mlp").apply(blk_params["mlp"], h)
        x = ops.residual(h, x)
        return x, {"k": k_cache, "v": v_cache}

    def forward_with_cache(self, params, tokens, cache, pos):
        """tokens [B,t] at absolute position ``pos`` → (logits [B,t,Vp], cache')."""
        cfg: GPT2Config = self.config
        B, t = tokens.shape
        positions = pos + jnp.arange(t)[None, :]
        wpe = params["encoder"].get("wpe")
        x = jnp.take(params["encoder"]["wte"], tokens, axis=0)
        if wpe is not None:
            x = x + jnp.take(wpe, positions, axis=0)
        new_cache = {}
        for i in range(cfg.num_layers):
            blk = self.get(f"h{i}")
            x, new_cache[f"h{i}"] = self._block_step(
                params[f"h{i}"], blk, x, cache[f"h{i}"], pos
            )
        x = self.get("ln_f").apply(params["ln_f"], x)
        return self._logits(params, x), new_cache

    # --- paged KV-cache path (engine default) ---

    def _qkv_step(self, blk, bp, x):
        cfg: GPT2Config = self.config
        B, t, C = x.shape
        NH = cfg.num_heads
        HS = C // NH
        h = blk.get("ln1").apply(bp["ln1"], x)
        qkv = blk.get("qkv").apply(bp["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return (
            q.reshape(B, t, NH, HS),
            k.reshape(B, t, NH, HS),
            v.reshape(B, t, NH, HS),
        )

    def _finish_block(self, blk, bp, x, att):
        B, t = att.shape[:2]
        h = blk.get("proj").apply(bp["proj"], att.reshape(B, t, -1))
        x = ops.residual(h, x)
        h = blk.get("ln2").apply(bp["ln2"], x)
        h = blk.get("mlp").apply(bp["mlp"], h)
        return ops.residual(h, x)

    def init_paged_cache(self, num_pages: int, page_size: int = 128,
                         dtype=jnp.bfloat16) -> dict:
        """Page pools [L, P, NH, HS, ps] (page-major kernel layout)."""
        from mila_tpu.inference.kv_cache import make_paged_pools

        cfg: GPT2Config = self.config
        HS = cfg.embedding_dim // cfg.num_heads
        return make_paged_pools(cfg.num_layers, cfg.num_heads, HS,
                                num_pages, page_size, dtype)

    def forward_paged_prefill(self, params, tokens, pools, page_table, true_len):
        """Batched prompt prefill into pages (see Llama.forward_paged_prefill)."""
        cfg: GPT2Config = self.config
        from mila_tpu.inference.kv_cache import paged_scatter
        from mila_tpu.ops.attention import attention

        B, T = tokens.shape
        ps = pools["k"].shape[4]
        pos_ids = jnp.arange(T)[None].repeat(B, 0)
        x = jnp.take(params["encoder"]["wte"], tokens, axis=0)
        wpe = params["encoder"].get("wpe")
        if wpe is not None:
            x = x + jnp.take(wpe, pos_ids, axis=0)
        page_ids = jnp.take_along_axis(page_table, pos_ids // ps, axis=1)
        offs = pos_ids % ps
        for i in range(cfg.num_layers):
            blk = self.get(f"h{i}")
            bp = params[f"h{i}"]
            q, k, v = self._qkv_step(blk, bp, x)
            att = attention(q, k, v, causal=True, impl=cfg.attention_impl)
            pools = paged_scatter(pools, i, page_ids, offs, k, v)
            x = self._finish_block(blk, bp, x, att)
        x = self.get("ln_f").apply(params["ln_f"], x)
        last = jnp.take_along_axis(
            x, jnp.maximum(true_len - 1, 0)[:, None, None].astype(jnp.int32), axis=1
        )
        return self._logits(params, last)[:, 0], pools

    def forward_paged_ragged(self, params, tokens, pools, page_table, positions):
        """Single-token paged decode with per-row positions."""
        cfg: GPT2Config = self.config
        from mila_tpu.inference.kv_cache import paged_attention_read, paged_scatter

        B = tokens.shape[0]
        ps = pools["k"].shape[4]
        x = jnp.take(params["encoder"]["wte"], tokens, axis=0)
        wpe = params["encoder"].get("wpe")
        if wpe is not None:
            x = x + jnp.take(wpe, positions[:, None], axis=0)
        rows = jnp.arange(B)
        page_ids = page_table[rows, positions // ps]
        offs = positions % ps
        lens = (positions + 1).astype(jnp.int32)
        for i in range(cfg.num_layers):
            blk = self.get(f"h{i}")
            bp = params[f"h{i}"]
            q, k, v = self._qkv_step(blk, bp, x)
            pools = paged_scatter(pools, i, page_ids, offs, k[:, 0], v[:, 0])
            att = paged_attention_read(pools, i, q, page_table, lens)
            x = self._finish_block(blk, bp, x, att)
        x = self.get("ln_f").apply(params["ln_f"], x)
        return self._logits(params, x), pools

    def forward_with_cache_ragged(self, params, tokens, cache, positions):
        """Single-token decode where each batch row sits at its own position.

        tokens [B,1]; positions [B] int32 (number of tokens already cached
        per row). Continuous-batching decode path.
        """
        cfg: GPT2Config = self.config
        B = tokens.shape[0]
        C = cfg.embedding_dim
        NH = cfg.num_heads
        HS = C // NH
        x = jnp.take(params["encoder"]["wte"], tokens, axis=0)
        wpe = params["encoder"].get("wpe")
        if wpe is not None:
            x = x + jnp.take(wpe, positions[:, None], axis=0)
        rows = jnp.arange(B)
        new_cache = {}
        for i in range(cfg.num_layers):
            blk = self.get(f"h{i}")
            bp = params[f"h{i}"]
            lcache = cache[f"h{i}"]
            h = blk.get("ln1").apply(bp["ln1"], x)
            qkv = blk.get("qkv").apply(bp["qkv"], h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, 1, NH, HS)
            k1 = k.reshape(B, NH, HS)
            v1 = v.reshape(B, NH, HS)
            k_cache = lcache["k"].at[rows, positions].set(
                k1.astype(lcache["k"].dtype)
            )
            v_cache = lcache["v"].at[rows, positions].set(
                v1.astype(lcache["v"].dtype)
            )
            att = ops.decode_attention(
                q, k_cache, v_cache, (positions + 1).astype(jnp.int32)
            )
            h = blk.get("proj").apply(bp["proj"], att.reshape(B, 1, C))
            x = ops.residual(h, x)
            h = blk.get("ln2").apply(bp["ln2"], x)
            h = blk.get("mlp").apply(bp["mlp"], h)
            x = ops.residual(h, x)
            new_cache[f"h{i}"] = {"k": k_cache, "v": v_cache}
        x = self.get("ln_f").apply(params["ln_f"], x)
        return self._logits(params, x), new_cache
