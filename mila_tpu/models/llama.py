"""Llama-3.x model family: RMSNorm + RoPE + GQA + SwiGLU, KV-cache decode.

BASELINE north-star architecture (these capabilities live on the reference's
dev branch — README.md:5-13 — and are required here: SURVEY.md §7 stage 5).
Structure mirrors HF LlamaForCausalLM so safetensors checkpoints map 1:1
(:func:`mila_tpu.serialization.safetensors_io.hf_llama_to_params`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from mila_tpu import ops
from mila_tpu.nn import Linear, LinearConfig
from mila_tpu.nn.layers import LayerNormConfig, RMSNorm
from mila_tpu.nn.module import CompositeModule, Params
from mila_tpu.utils.config import BaseConfig, ConfigError
from mila_tpu.utils.rng import split_named


@dataclasses.dataclass(frozen=True)
class LlamaConfig(BaseConfig):
    vocab_size: int = 128256
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_layers: int = 16
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 0  # 0 → hidden_size // num_heads
    max_seq_len: int = 8192
    rope_theta: float = 500000.0
    rope_scaling: Optional[dict] = None
    rms_eps: float = 1e-5
    tie_embeddings: bool = True  # Llama-3.2-1B ties lm_head to embed
    param_dtype: str = "bfloat16"
    attention_impl: str = "auto"  # auto | xla | flash

    def validate(self):
        if min(self.vocab_size, self.hidden_size, self.num_layers, self.num_heads) <= 0:
            raise ConfigError("all Llama dims must be positive")
        if self.num_heads % self.num_kv_heads != 0:
            raise ConfigError("num_heads must divide by num_kv_heads")

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @staticmethod
    def llama32_1b() -> "LlamaConfig":
        """Llama-3.2-1B (HF config.json values)."""
        return LlamaConfig(
            name="llama-3.2-1b",
            vocab_size=128256,
            hidden_size=2048,
            intermediate_size=8192,
            num_layers=16,
            num_heads=32,
            num_kv_heads=8,
            head_dim=64,
            max_seq_len=131072,
            rope_theta=500000.0,
            rope_scaling={
                "rope_type": "llama3",
                "factor": 32.0,
                "low_freq_factor": 1.0,
                "high_freq_factor": 4.0,
                "original_max_position_embeddings": 8192,
            },
            tie_embeddings=True,
        )

    @staticmethod
    def tiny(vocab_size: int = 512) -> "LlamaConfig":
        """Small config for tests/integration."""
        return LlamaConfig(
            name="llama-tiny",
            vocab_size=vocab_size,
            hidden_size=128,
            intermediate_size=256,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            max_seq_len=128,
            rope_theta=10000.0,
            param_dtype="float32",
        )


class LlamaBlock(CompositeModule):
    """Decoder layer: x += wo(attn(rope(wq,wk), wv) after ln_attn);
    x += down(swiglu(gate, up)) after ln_mlp."""

    def __init__(self, config: LlamaConfig, name: str):
        super().__init__(BaseConfig(name=name))
        self.cfg = config
        H, HD = config.hidden_size, config.hd
        NH, NKV = config.num_heads, config.num_kv_heads
        dt = config.param_dtype
        lin = lambda n, i, o: Linear(  # noqa: E731
            LinearConfig(name=n, in_features=i, out_features=o, has_bias=False,
                         initializer="normal", param_dtype=dt)
        )
        self.add("ln_attn", RMSNorm(LayerNormConfig(name="ln_attn", features=H,
                                                    eps=config.rms_eps, param_dtype=dt)))
        self.add("wq", lin("wq", H, NH * HD))
        self.add("wk", lin("wk", H, NKV * HD))
        self.add("wv", lin("wv", H, NKV * HD))
        self.add("wo", lin("wo", NH * HD, H))
        self.add("ln_mlp", RMSNorm(LayerNormConfig(name="ln_mlp", features=H,
                                                   eps=config.rms_eps, param_dtype=dt)))
        self.add("gate", lin("gate", H, config.intermediate_size))
        self.add("up", lin("up", H, config.intermediate_size))
        self.add("down", lin("down", config.intermediate_size, H))

    def init(self, key, input_shape):
        ks = split_named(key, *[n for n, _ in self.children()])
        out = {}
        for name, child in self.children():
            shape = input_shape
            if name == "down":
                shape = (*input_shape[:-1], self.cfg.intermediate_size)
            elif name == "wo":
                shape = (*input_shape[:-1], self.cfg.num_heads * self.cfg.hd)
            out[name] = child.init(ks[name], shape)
        return out

    def _fused_decode(self, params, x) -> bool:
        """True when the whole-layer fused decode kernels apply: quantized
        fused projections at decode batch sizes (kernels/decode_fused.py —
        RMSNorm/residual/SwiGLU fold into the weight-stream matmuls)."""
        B, T = x.shape[:2]
        return (
            B * T <= 32
            and "wqkv" in params
            and "wgu" in params
            and type(params["wqkv"]["weight"]).__name__ == "QTensor"
            and type(params["wgu"]["weight"]).__name__ == "QTensor"
        )

    def _qkv(self, params, x):
        cfg = self.cfg
        B, T, _ = x.shape
        NQ = cfg.num_heads * cfg.hd
        NKVD = cfg.num_kv_heads * cfg.hd
        if self._fused_decode(params, x):
            from mila_tpu.kernels.decode_fused import rms_quant_linear

            qkv = rms_quant_linear(
                x, params["ln_attn"]["gamma"], params["wqkv"]["weight"],
                eps=cfg.rms_eps,
            )
            q, k, v = jnp.split(qkv, [NQ, NQ + NKVD], axis=-1)
        elif "wqkv" in params:
            # Fused projection (fuse_llama_projections): one weight stream
            # instead of three — fewer kernel launches, better HBM use at
            # decode batch sizes.
            h = self.get("ln_attn").apply(params["ln_attn"], x)
            qkv = self.get("wq").apply(params["wqkv"], h)
            q, k, v = jnp.split(qkv, [NQ, NQ + NKVD], axis=-1)
        else:
            h = self.get("ln_attn").apply(params["ln_attn"], x)
            q = self.get("wq").apply(params["wq"], h)
            k = self.get("wk").apply(params["wk"], h)
            v = self.get("wv").apply(params["wv"], h)
        return (
            q.reshape(B, T, cfg.num_heads, cfg.hd),
            k.reshape(B, T, cfg.num_kv_heads, cfg.hd),
            v.reshape(B, T, cfg.num_kv_heads, cfg.hd),
        )

    def _finish_attn(self, params, x, att):
        B, T = att.shape[:2]
        if self._fused_decode(params, x):
            if "mlp_pack" in params:
                # Whole-MLP megakernel: wo+residual -> RMSNorm -> gate|up ->
                # SwiGLU -> down+residual as ONE uninterrupted weight stream
                # (kernels/decode_mlp.py; r3 fix for the per-matmul pipeline
                # prologue losses on the small wo/down matrices).
                from mila_tpu.kernels.decode_mlp import mlp_block_fused

                return mlp_block_fused(
                    att.reshape(B, T, -1), x, params["ln_mlp"]["gamma"],
                    params["mlp_pack"], eps=self.cfg.rms_eps,
                )
            from mila_tpu.kernels.decode_fused import (
                quant_linear_residual,
                rms_quant_linear_swiglu,
            )

            wo_q = params["wo"]["weight"]
            down_q = params["down"]["weight"]
            if (
                type(wo_q).__name__ == "QTensor"
                and type(down_q).__name__ == "QTensor"
            ):
                x = quant_linear_residual(att.reshape(B, T, -1), wo_q, x)
                h = rms_quant_linear_swiglu(
                    x, params["ln_mlp"]["gamma"], params["wgu"]["weight"],
                    eps=self.cfg.rms_eps,
                )
                return quant_linear_residual(h, down_q, x)
        h = self.get("wo").apply(params["wo"], att.reshape(B, T, -1))
        x = ops.residual(h, x)
        h = self.get("ln_mlp").apply(params["ln_mlp"], x)
        if "wgu" in params:
            gu = self.get("gate").apply(params["wgu"], h)
            g, u = jnp.split(gu, 2, axis=-1)
        else:
            g = self.get("gate").apply(params["gate"], h)
            u = self.get("up").apply(params["up"], h)
        h = self.get("down").apply(params["down"], ops.swiglu(g, u))
        return ops.residual(h, x)

    def apply(self, params, x, *, cos=None, sin=None, training=False, rngs=None):
        from mila_tpu.ops.attention import attention

        q, k, v = self._qkv(params, x)
        q = ops.apply_rope(q, cos, sin)
        k = ops.apply_rope(k, cos, sin)
        att = attention(q, k, v, causal=True, impl=self.cfg.attention_impl)
        return self._finish_attn(params, x, att)

    def apply_with_cache(self, params, x, cache, pos, cos, sin):
        """Incremental step: x [B,t,H] at absolute position pos.

        Cache layout is token-major [B, maxT, NKV, HD] (see init_kv_cache):
        the new token inserts with one CONTIGUOUS dynamic_update_slice (the
        head-major r3 experiment made this a 64-lane strided scatter that
        cost ~64us/layer in XLA); the Pallas dense decode attention kernel
        reads the same layout as [B, maxT, NKV*HD] lane-packed rows.
        """
        q, k, v = self._qkv(params, x)
        q = ops.apply_rope(q, cos, sin)
        k = ops.apply_rope(k, cos, sin)
        k_cache = jax.lax.dynamic_update_slice(
            cache["k"], k.astype(cache["k"].dtype), (0, pos, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            cache["v"], v.astype(cache["v"].dtype), (0, pos, 0, 0)
        )
        B, t = x.shape[:2]
        total = pos + t
        if t == 1:
            from mila_tpu.kernels.dense_attention import dense_decode_attention

            att = dense_decode_attention(
                q, k_cache, v_cache, jnp.full((B,), total, jnp.int32)
            )
        else:
            maxT = k_cache.shape[1]
            kj = jax.lax.broadcasted_iota(jnp.int32, (t, maxT), 1)
            qi = jax.lax.broadcasted_iota(jnp.int32, (t, maxT), 0) + pos
            mask = (kj <= qi)[None].repeat(B, 0)
            att = ops.dot_product_attention(q, k_cache, v_cache,
                                            causal=False, mask=mask)
        return self._finish_attn(params, x, att), {"k": k_cache, "v": v_cache}

    def output_shape(self, input_shape):
        return tuple(input_shape)


def fuse_llama_projections(params: dict) -> dict:
    """Fuse per-block [wq|wk|wv] → wqkv and [gate|up] → wgu (weights [in, out]
    concatenated on the out axis). Run BEFORE quantize_model_params so the
    fused weights quantize as single tensors. Decode-path optimization: 7
    projection streams per block become 4.
    """
    out = dict(params)
    for name, blk in params.items():
        if not (isinstance(blk, dict) and "wq" in blk and "gate" in blk):
            continue
        b = dict(blk)
        wqkv = jnp.concatenate(
            [b["wq"]["weight"], b["wk"]["weight"], b["wv"]["weight"]], axis=1
        )
        wgu = jnp.concatenate([b["gate"]["weight"], b["up"]["weight"]], axis=1)
        b["wqkv"] = {"weight": wqkv}
        b["wgu"] = {"weight": wgu}
        for k in ("wq", "wk", "wv", "gate", "up"):
            del b[k]
        out[name] = b
    return out


def pack_decode_mlp(params: dict, *, bn: int = 2048) -> dict:
    """Add the whole-MLP megakernel weight pack (``mlp_pack``) to every
    quantized block. Run AFTER fuse_llama_projections + quantize_model_params.

    The original wo/wgu/down QTensors stay in the pytree — prefill (M > 32)
    still uses the per-matmul kernels — so the packed copy costs one extra
    int8 image of those three weights in HBM (~55MB/layer for Llama-1B), the
    standard decode/prefill weight-specialization trade.
    """
    from mila_tpu.inference.quantize import QTensor
    from mila_tpu.kernels.decode_mlp import pack_mlp

    out = dict(params)
    for name, blk in params.items():
        if not (isinstance(blk, dict) and "wgu" in blk and "wo" in blk):
            continue
        wo = blk["wo"].get("weight")
        wgu = blk["wgu"].get("weight")
        down = blk["down"].get("weight")
        if not all(isinstance(w, QTensor) for w in (wo, wgu, down)):
            continue
        pack = pack_mlp(wo, wgu, down, bn=bn)
        if pack is None:
            continue
        b = dict(blk)
        b["mlp_pack"] = pack
        out[name] = b
    return out


def pack_decode_layers(params: dict, *, bn: int = 512,
                       num_layers: int = 0) -> dict:
    """Add the whole-layer decode weight stream (``layer_stream``, one
    stacked array for EVERY layer): wo+wgu+down of layer i plus wqkv of
    layer i+1 (kernels/layer_stream.py). Run AFTER fuse_llama_projections +
    quantize_model_params.

    Like :func:`pack_decode_mlp` this keeps the original QTensors for the
    prefill path, trading one extra int8 weight image in HBM for the
    decode-specialized layout. All-or-nothing: the stream is added only if
    every layer packs (one compiled kernel serves the whole stack).
    """
    from mila_tpu.inference.quantize import QTensor
    from mila_tpu.kernels.layer_fused import pack_layer
    from mila_tpu.kernels.layer_stream import pack_layer_stream

    def get_qt(blk, name):
        w = blk.get(name, {}).get("weight") if isinstance(blk, dict) else None
        return w if isinstance(w, QTensor) else None

    layer_names = sorted(
        (n for n in params if n.startswith("h") and n[1:].isdigit()),
        key=lambda n: int(n[1:]),
    )
    packs = []
    for idx, name in enumerate(layer_names):
        blk = params[name]
        wo, wgu, down = (get_qt(blk, k) for k in ("wo", "wgu", "down"))
        if not all((wo, wgu, down)):
            return params
        wqkv_next = None
        if idx + 1 < len(layer_names):
            wqkv_next = get_qt(params[layer_names[idx + 1]], "wqkv")
            if wqkv_next is None:
                return params  # chain broken: next layer can't be fed
        pack = pack_layer(wo, wgu, down, wqkv_next, bn=bn)
        if pack is None:
            return params
        packs.append(pack)
    stream = pack_layer_stream(packs)
    if stream is None:
        return params
    out = dict(params)
    out["layer_stream"] = stream
    return out


def pack_decode_megalayers(params: dict, cfg, *, bn: int = 512) -> dict:
    """Per-layer single-kernel decode packs (kernels/layer_mega.py): wo's
    rows and the NEXT layer's wq columns are permuted to the kernel's slot
    head order at pack time, plus a slot-permuted copy of layer 0's wqkv
    for the standalone first projection. Run AFTER fuse_llama_projections +
    quantize_model_params. All-or-nothing."""
    from mila_tpu.inference.quantize import QTensor
    from mila_tpu.kernels.layer_mega import pack_mega_layer, permute_q_columns

    NH, NKV, HD = cfg.num_heads, cfg.num_kv_heads, cfg.hd

    def get_qt(blk, name):
        w = blk.get(name, {}).get("weight") if isinstance(blk, dict) else None
        return w if isinstance(w, QTensor) else None

    layer_names = sorted(
        (n for n in params if n.startswith("h") and n[1:].isdigit()),
        key=lambda n: int(n[1:]),
    )
    megas = []
    for idx, name in enumerate(layer_names):
        blk = params[name]
        wo, wgu, down = (get_qt(blk, k) for k in ("wo", "wgu", "down"))
        if not all((wo, wgu, down)):
            return params
        wqkv_next = None
        if idx + 1 < len(layer_names):
            wqkv_next = get_qt(params[layer_names[idx + 1]], "wqkv")
            if wqkv_next is None:
                return params
        mp = pack_mega_layer(wo, wgu, down, wqkv_next, nh=NH, nkv=NKV,
                             hd=HD, bn=bn)
        if mp is None:
            return params
        megas.append(mp)
    wqkv0 = get_qt(params[layer_names[0]], "wqkv")
    if wqkv0 is None:
        return params
    out = dict(params)
    for name, mp in zip(layer_names, megas):
        b = dict(out[name])
        b["mega_pack"] = mp
        out[name] = b
    b0 = dict(out[layer_names[0]])
    b0["wqkv_slot"] = permute_q_columns(wqkv0, NH, NKV, HD)
    out[layer_names[0]] = b0
    return out


def pack_decode_giga(params: dict, cfg, *, bn: int = 512,
                     bf16_stream: bool = False) -> dict:
    """Add the WHOLE-MODEL decode weight stream (``giga_pack``): every
    layer's slot-permuted wo + wgu + down + next-layer wqkv plus the padded
    quantized lm_head, stacked into one [NTOT, H, bn] tile array driven by
    kernels/decode_giga.py (one Pallas kernel per decode step). Run AFTER
    fuse_llama_projections + quantize_model_params + add_quantized_lm_head.
    All-or-nothing: falls back to the per-layer streams when shapes don't
    fit."""
    from mila_tpu.inference.quantize import QTensor
    from mila_tpu.inference.requant import requantize_int8
    from mila_tpu.kernels.decode_giga import pack_giga

    def get_qt(blk, name):
        w = blk.get(name, {}).get("weight") if isinstance(blk, dict) else None
        if bf16_mode:
            if isinstance(w, QTensor) or w is None or w.ndim != 2:
                return None
            return unit_qtensor(w)
        if not isinstance(w, QTensor):
            return None
        # FP8 weights are re-expressed on an int8 grid for the decode
        # stream: same bytes/step, none of the in-kernel bit-decode VPU
        # cost (inference/requant.py — the r4 fp8-regression fix). INT4
        # weights are nibble-unpacked to int8 rows: the in-kernel unpack is
        # VPU-bound (~3 us/tile vs int8's 1.49 measured stream slack,
        # benchmarks/r5_stream_probe.py), so int4 keeps its 2x HBM-capacity
        # saving at rest and decodes through an int8-width stream. The
        # original QTensors stay in the pytree for prefill.
        from mila_tpu.inference.quantize import unpack_int4

        return requantize_int8(unpack_int4(w))

    from mila_tpu.inference.quantize import unit_qtensor, unpack_int4

    bf16_mode = False
    head = params.get("lm_head_q")
    if isinstance(head, QTensor):
        head = requantize_int8(unpack_int4(head))
    else:
        # Unquantized (bf16) model: the giga stream CAN carry plain bf16
        # tiles with unit scales (head = padded tied wte^T), but measured
        # 10.1 ms/step at Llama-1B (Mosaic won't pipeline 2MB-tile groups;
        # benchmarks/r5_giga.py --dtype bf16) vs 4.1 ms on the per-layer
        # path — so bf16 only packs when explicitly requested (tests).
        if not bf16_stream:
            return params
        bf16_mode = True
        wt = jnp.asarray(params["embed"]["wte"]).T
        V = wt.shape[1]
        vpad = -(-V // bn) * bn
        if vpad != V:
            wt = jnp.pad(wt, ((0, 0), (0, vpad - V)))
        head = unit_qtensor(wt)
    layer_names = sorted(
        (n for n in params if n.startswith("h") and n[1:].isdigit()),
        key=lambda n: int(n[1:]),
    )
    weights, ga, gm = [], [], []
    for name in layer_names:
        blk = params[name]
        wo, wgu, down, wqkv = (get_qt(blk, k)
                               for k in ("wo", "wgu", "down", "wqkv"))
        if not all((wo, wgu, down, wqkv)):
            return params
        weights.append((wo, wgu, down, wqkv))
        ga.append(jnp.asarray(blk["ln_attn"]["gamma"], jnp.float32))
        gm.append(jnp.asarray(blk["ln_mlp"]["gamma"], jnp.float32))
    from mila_tpu.ops.rope import rope_frequencies

    pack = pack_giga(
        weights, head, jnp.stack(ga), jnp.stack(gm),
        jnp.asarray(params["norm_f"]["gamma"], jnp.float32),
        nh=cfg.num_heads, nkv=cfg.num_kv_heads, hd=cfg.hd,
        vocab=cfg.vocab_size, eps=cfg.rms_eps, bn=bn,
        rope_inv_freq=rope_frequencies(cfg.hd, cfg.rope_theta,
                                       cfg.rope_scaling),
    )
    if pack is None:
        return params
    out = dict(params)
    out["giga_pack"] = pack
    return out


def add_quantized_lm_head(params: dict, dtype: str = "int8",
                          pad_to: int = 2048) -> dict:
    """For tied-embedding models: add an int8/fp8 copy of wte^T used only by
    the output head (the embedding gather keeps the original precision).
    Costs one extra int8 copy of the vocab matrix in HBM; halves the head's
    per-step weight stream.

    The vocab axis is zero-padded to a multiple of ``pad_to``: 128256 is not
    divisible by any large block_n, which silently shrinks the Pallas
    dequant-matmul to 256-wide tiles (measured ~2x slower streaming). The
    padded logits are sliced back to vocab_size in ``_logits``.
    """
    from mila_tpu.inference.quantize import quantize

    out = dict(params)
    wt = jnp.asarray(params["embed"]["wte"]).T  # [H, V]
    V = wt.shape[1]
    vpad = -(-V // pad_to) * pad_to
    if vpad != V:
        wt = jnp.pad(wt, ((0, 0), (0, vpad - V)))
    out["lm_head_q"] = quantize(wt, dtype)
    return out


class Llama(CompositeModule):
    def __init__(self, config: LlamaConfig):
        super().__init__(config)
        cfg = config
        dt = cfg.param_dtype
        from mila_tpu.nn import Encoder, EncoderConfig

        self.add(
            "embed",
            Encoder(EncoderConfig(name="embed", vocab_size=cfg.vocab_size,
                                  embedding_dim=cfg.hidden_size, max_seq_len=0,
                                  param_dtype=dt)),
        )
        for i in range(cfg.num_layers):
            self.add(f"h{i}", LlamaBlock(cfg, f"h{i}"))
        self.add("norm_f", RMSNorm(LayerNormConfig(name="norm_f", features=cfg.hidden_size,
                                                   eps=cfg.rms_eps, param_dtype=dt)))
        if not cfg.tie_embeddings:
            self.add("lm_head", Linear(LinearConfig(
                name="lm_head", in_features=cfg.hidden_size,
                out_features=cfg.vocab_size, has_bias=False, param_dtype=dt)))

    def init(self, key, input_shape):
        cfg: LlamaConfig = self.config
        ks = split_named(key, *[n for n, _ in self.children()])
        B, T = input_shape
        out: Params = {"embed": self.get("embed").init(ks["embed"], (B, T))}
        shape = (B, T, cfg.hidden_size)
        for name, child in self.children():
            if name == "embed":
                continue
            out[name] = child.init(ks[name], shape)
        return out

    def _rope(self, positions):
        cfg: LlamaConfig = self.config
        return ops.rope_cos_sin(
            positions, cfg.hd, cfg.rope_theta, cfg.rope_scaling
        )

    def _logits(self, params, x):
        if "lm_head_q" in params:
            # Quantized head (add_quantized_lm_head): the tied-embedding
            # head matmul otherwise streams the full bf16 wte every step —
            # the single largest weight read at decode. Vocab axis may be
            # block-padded; slice back.
            from mila_tpu.kernels.quant_matmul import quant_linear

            return quant_linear(x, params["lm_head_q"])[..., : self.config.vocab_size]
        if self.config.tie_embeddings:
            return ops.linear(x, params["embed"]["wte"].T, None)
        return self.get("lm_head").apply(params["lm_head"], x)

    def _norm_logits(self, params, x):
        """norm_f + lm head; fuses the final RMSNorm into the quantized head
        stream at decode shapes (kernels/decode_fused.py)."""
        B, T = x.shape[:2]
        if "lm_head_q" in params and B * T <= 32:
            from mila_tpu.kernels.decode_fused import rms_quant_linear

            logits = rms_quant_linear(
                x, params["norm_f"]["gamma"], params["lm_head_q"],
                eps=self.config.rms_eps,
            )
            return logits[..., : self.config.vocab_size]
        x = self.get("norm_f").apply(params["norm_f"], x)
        return self._logits(params, x)

    def greedy_step_with_cache(self, params, tokens, cache, pos):
        """Greedy decode step: returns (next_token [B,1] int32, new_cache).

        At decode shapes with a quantized head the argmax fuses into the
        lm_head weight stream (kernels/decode_fused.rms_quant_linear_argmax)
        — the [B, vocab] logits never round-trip HBM and the ~62us XLA
        argmax disappears. Falls back to forward_with_cache + argmax.
        """
        cfg: LlamaConfig = self.config
        B, t = tokens.shape
        if "lm_head_q" in params and B * t <= 32:
            from mila_tpu.kernels.decode_fused import rms_quant_linear_argmax

            x, new_cache = self._backbone_with_cache(params, tokens, cache, pos)
            tok = rms_quant_linear_argmax(
                x[:, -1:, :], params["norm_f"]["gamma"], params["lm_head_q"],
                vocab_size=cfg.vocab_size, eps=cfg.rms_eps,
            )
            if tok is not None:
                return tok.reshape(B, 1), new_cache
            logits = self._norm_logits(params, x[:, -1:, :])
        else:
            logits, new_cache = self.forward_with_cache(params, tokens, cache, pos)
        nxt = jnp.argmax(logits[:, -1, : cfg.vocab_size], axis=-1)
        return nxt.astype(jnp.int32)[:, None], new_cache

    # --- whole-model single-kernel decode (kernels/decode_giga.py) ---

    def stack_kv_cache(self, cache: dict):
        """Per-layer dict cache -> stacked (k_pool, v_pool) [L, B, T,
        NKV*HD] for the giga decode step (one-time copy after prefill).
        Kept 4-D: a 5-D carried pool picks up a different XLA layout and
        every in-loop reshape becomes a 134MB layout-conversion copy."""
        cfg: LlamaConfig = self.config
        L = cfg.num_layers
        k = jnp.stack([cache[f"h{i}"]["k"] for i in range(L)])
        v = jnp.stack([cache[f"h{i}"]["v"] for i in range(L)])
        _, B, T, NKV, HD = k.shape
        return (k.reshape(L, B, T, NKV * HD), v.reshape(L, B, T, NKV * HD))

    def unstack_kv_cache(self, k_pool, v_pool) -> dict:
        cfg: LlamaConfig = self.config
        L, B, T, KD = k_pool.shape
        NKV, HD = cfg.num_kv_heads, cfg.hd
        return {
            f"h{i}": {"k": k_pool[i].reshape(B, T, NKV, HD),
                      "v": v_pool[i].reshape(B, T, NKV, HD)}
            for i in range(L)
        }

    def _giga_tables(self, lens):
        """Full-width tiled rope tables for the giga kernel (cos duplicated
        across split halves, sin pre-signed [-sin | sin])."""
        cfg: LlamaConfig = self.config
        B = lens.shape[0]
        d2 = cfg.hd // 2
        cos, sin = self._rope(lens[:, None])
        c2 = cos.reshape(B, d2)
        s2 = sin.reshape(B, d2)
        cos_t = jnp.tile(jnp.concatenate([c2, c2], -1), (1, cfg.num_kv_heads))
        sin_t = jnp.tile(jnp.concatenate([-s2, s2], -1), (1, cfg.num_kv_heads))
        return cos_t, sin_t

    def giga_step(self, params, tokens, k_pool, v_pool, lens):
        """One whole-model decode step in ONE Pallas kernel: [embed lookup
        + rope tables + all layers' attention + cache RMW + tails + lm_head
        argmax] — the step has NO per-step XLA glue (kernels/
        decode_giga.py). ``lens`` [B] int32 = live cache rows per sequence
        (current token excluded). Returns (next_token [B,1] i32, logits
        [B, vocab], k_pool', v_pool') with the pools updated in place —
        donate them."""
        from mila_tpu.kernels.decode_giga import giga_decode_step

        cfg: LlamaConfig = self.config
        tok, logits, k_pool, v_pool = giga_decode_step(
            params["embed"]["wte"], None, None, lens,
            params["giga_pack"], k_pool, v_pool,
            tokens=tokens.reshape(-1),
        )
        return tok, logits[:, : cfg.vocab_size], k_pool, v_pool

    def apply(self, params, tokens, *, training=False, rngs=None):
        cfg: LlamaConfig = self.config
        B, T = tokens.shape
        x = jnp.take(params["embed"]["wte"], tokens, axis=0)
        cos, sin = self._rope(jnp.arange(T)[None].repeat(B, 0))
        for i in range(cfg.num_layers):
            x = self.get(f"h{i}").apply(params[f"h{i}"], x, cos=cos, sin=sin,
                                        training=training, rngs=rngs)
        x = self.get("norm_f").apply(params["norm_f"], x)
        return self._logits(params, x)

    def output_shape(self, input_shape):
        return (*tuple(input_shape), self.config.vocab_size)

    # --- KV-cache path (Generator protocol) ---

    def init_kv_cache(self, batch_size: int, max_len: int = 0, dtype=jnp.bfloat16) -> dict:
        cfg: LlamaConfig = self.config
        maxT = max_len or min(cfg.max_seq_len, 4096)
        # The fused decode kernels write the new row via an 8-row-aligned
        # RMW DMA; a non-multiple-of-8 T would put the last block's RMW
        # out of bounds (ADVICE r4 #2).
        maxT = (maxT + 7) // 8 * 8
        # PER-LAYER token-major caches {"h{i}": {"k","v"} [B, maxT, NKV, HD]}.
        # Each layer's cache is its own carried buffer, so the per-step
        # insert is an in-place dynamic_update_slice. (The r3 stacked
        # [L, B, T, NKV, HD] pool forced every in-loop update to copy the
        # whole 134MB pool — any DUS whose operand is a slice of a live
        # stacked array materializes it; benchmarks/r4_dus.py v5 vs v7.)
        shape = (batch_size, maxT, cfg.num_kv_heads, cfg.hd)
        return {
            f"h{i}": {"k": jnp.zeros(shape, dtype),
                      "v": jnp.zeros(shape, dtype)}
            for i in range(cfg.num_layers)
        }

    def _backbone_with_cache(self, params, tokens, cache, pos):
        """Embed + decoder stack (no head): returns (x [B,t,H], new_cache)."""
        cfg: LlamaConfig = self.config
        B, t = tokens.shape
        x = jnp.take(params["embed"]["wte"], tokens, axis=0)
        positions = pos + jnp.arange(t)[None].repeat(B, 0)
        cos, sin = self._rope(positions)
        if t == 1 and B <= 32 and (
            "layer_stream" in params or "mega_pack" in params.get("h0", {})
        ):
            old_lens = jnp.full((B,), pos, jnp.int32)
            return self._backbone_fused_decode(params, x, cache, old_lens,
                                               cos, sin)
        new_cache = {}
        for i in range(cfg.num_layers):
            x, lc = self.get(f"h{i}").apply_with_cache(
                params[f"h{i}"], x, cache[f"h{i}"], pos, cos, sin
            )
            new_cache[f"h{i}"] = lc
        return x, new_cache

    def _backbone_fused_decode(self, params, x, cache, old_lens, cos, sin):
        """Two-kernel-per-layer megakernel decode: [dense attention with
        in-kernel rope + cache write-back] -> [layer tail: wo|rms|SwiGLU|
        down + NEXT layer's rms+wqkv] (kernels/layer_stream.py). The
        attention kernel updates each layer's cache IN PLACE (aliased
        refs) — an XLA DUS on a buffer a pallas call reads cannot alias
        and silently copied 8MB/layer (benchmarks/r4_layer.py). Supports
        per-row ``old_lens`` (continuous batching)."""
        cfg: LlamaConfig = self.config
        from mila_tpu.kernels.decode_fused import rms_quant_linear
        from mila_tpu.kernels.dense_attention import (
            fused_decode_attention,
            pack_queries,
        )
        from mila_tpu.kernels.layer_stream import layer_tail_stream

        B = x.shape[0]
        NH, NKV, HD = cfg.num_heads, cfg.num_kv_heads, cfg.hd
        NQ = NH * HD
        KD = NKV * HD
        # Full-width tiled rope tables, computed ONCE per step: cos duplicated
        # across the split halves, sin pre-signed [-sin | sin] — the kernel
        # applies rope as x*cos + lane_swap(x)*sin (dense_attention module doc).
        d2 = HD // 2
        c2 = cos.reshape(B, d2)
        s2 = sin.reshape(B, d2)
        cos_t = jnp.tile(jnp.concatenate([c2, c2], -1), (1, NKV))
        sin_t = jnp.tile(jnp.concatenate([-s2, s2], -1), (1, NKV))
        # Mega kernel holds the layer's whole [B, T, KD] KV cache in VMEM:
        # gate on a VMEM budget (r4 advisor) — ~2 x 16MB KV + ~6MB weight
        # ring must fit in the v5e's 128MB; fall back to the two-kernel
        # layer_stream path for bigger caches.
        kc0 = cache["h0"]["k"]
        kv_vmem = 2 * 2 * kc0.size * kc0.dtype.itemsize  # double-buffered
        fits = kv_vmem <= 72 * 1024 * 1024 or "layer_stream" not in params
        if "mega_pack" in params["h0"] and fits:
            return self._backbone_mega_decode(
                params, x, cache, old_lens, cos_t, sin_t)
        qkv = rms_quant_linear(
            x, params["h0"]["ln_attn"]["gamma"], params["h0"]["wqkv"]["weight"],
            eps=cfg.rms_eps,
        )
        new_cache = {}
        for i in range(cfg.num_layers):
            bp = params[f"h{i}"]
            lc = cache[f"h{i}"]
            qkv2 = qkv.reshape(B, NQ + 2 * KD)
            q_pk = pack_queries(qkv2[:, :NQ].reshape(B, NH, HD), NKV)
            att, _k_new, k_c, v_c = fused_decode_attention(
                qkv2, q_pk, cos_t, sin_t, lc["k"], lc["v"], old_lens,
                num_heads=NH,
            )
            new_cache[f"h{i}"] = {"k": k_c, "v": v_c}
            gamma_next = (
                params[f"h{i + 1}"]["ln_attn"]["gamma"]
                if i + 1 < cfg.num_layers else None
            )
            x, qkv = layer_tail_stream(
                att.reshape(B, 1, NQ), x, bp["ln_mlp"]["gamma"],
                params["layer_stream"], i, gamma_next, eps=cfg.rms_eps,
            )
        return x, new_cache

    def _backbone_mega_decode(self, params, x, cache, old_lens, cos_t, sin_t):
        """Single-kernel-per-layer decode (kernels/layer_mega.py): GQA
        attention + cache write-back + the whole layer tail in ONE Pallas
        call per layer — the attention DMAs and compute hide under the
        weight stream, eliminating the per-boundary DMA idle that floors
        the two-kernel wiring at ~116us/layer (benchmarks/r4_layer.py)."""
        cfg: LlamaConfig = self.config
        from mila_tpu.kernels.decode_fused import rms_quant_linear
        from mila_tpu.kernels.layer_mega import layer_megakernel

        B = x.shape[0]
        NH = cfg.num_heads
        qkv = rms_quant_linear(
            x, params["h0"]["ln_attn"]["gamma"], params["h0"]["wqkv_slot"],
            eps=cfg.rms_eps,
        ).reshape(B, -1)
        x2 = x.reshape(B, cfg.hidden_size)
        new_cache = {}
        for i in range(cfg.num_layers):
            bp = params[f"h{i}"]
            lc = cache[f"h{i}"]
            gamma_next = (
                params[f"h{i + 1}"]["ln_attn"]["gamma"]
                if i + 1 < cfg.num_layers else None
            )
            x2, qkv, k_c, v_c = layer_megakernel(
                qkv, x2, bp["ln_mlp"]["gamma"], bp["mega_pack"],
                lc["k"], lc["v"], old_lens, cos_t, sin_t, gamma_next,
                num_heads=NH, eps=cfg.rms_eps,
            )
            new_cache[f"h{i}"] = {"k": k_c, "v": v_c}
        return x2.reshape(B, 1, cfg.hidden_size), new_cache

    def forward_with_cache(self, params, tokens, cache, pos):
        x, new_cache = self._backbone_with_cache(params, tokens, cache, pos)
        return self._norm_logits(params, x), new_cache

    # --- paged KV-cache path (engine default; BASELINE "paged BF16 KV") ---

    def init_paged_cache(self, num_pages: int, page_size: int = 128,
                         dtype=jnp.bfloat16) -> dict:
        """Page pools [L, P, NKV, HD, ps] (page-major, transposed pages: one DMA
        per page in :func:`mila_tpu.kernels.paged_attention.paged_decode_attention`)."""
        from mila_tpu.inference.kv_cache import make_paged_pools

        cfg: LlamaConfig = self.config
        return make_paged_pools(cfg.num_layers, cfg.num_kv_heads, cfg.hd,
                                num_pages, page_size, dtype)

    def forward_paged_prefill(self, params, tokens, pools, page_table, true_len):
        """Batched prompt prefill into pages.

        tokens [B, T] (right-padded), page_table [B, W] physical page ids,
        true_len [B] valid lengths. Fresh sequences only (start at pos 0):
        attention is plain causal over the just-computed K/V; pages are
        written for the whole bucket (trailing padding pages are trimmed by
        the host allocator afterwards). Returns (last-token logits [B, V],
        pools) — the hidden state is gathered at true_len-1 BEFORE the lm
        head so the head matmul runs on one row per sequence, not T.
        """
        cfg: LlamaConfig = self.config
        from mila_tpu.inference.kv_cache import paged_scatter
        from mila_tpu.ops.attention import attention

        B, T = tokens.shape
        ps = pools["k"].shape[4]
        x = jnp.take(params["embed"]["wte"], tokens, axis=0)
        pos_ids = jnp.arange(T)[None].repeat(B, 0)
        cos, sin = self._rope(pos_ids)
        page_ids = jnp.take_along_axis(
            page_table, pos_ids // ps, axis=1
        )  # [B, T]
        offs = pos_ids % ps
        for i in range(cfg.num_layers):
            blk = self.get(f"h{i}")
            bp = params[f"h{i}"]
            q, k, v = blk._qkv(bp, x)
            q = ops.apply_rope(q, cos, sin)
            k = ops.apply_rope(k, cos, sin)
            att = attention(q, k, v, causal=True, impl=cfg.attention_impl)
            pools = paged_scatter(pools, i, page_ids, offs, k, v)
            x = blk._finish_attn(bp, x, att)
        # Gather the last valid token BEFORE norm_f (rowwise norm commutes
        # with the gather) so both the norm and the head run on B rows, not T.
        last = jnp.take_along_axis(
            x, jnp.maximum(true_len - 1, 0)[:, None, None].astype(jnp.int32), axis=1
        )
        return self._norm_logits(params, last)[:, 0], pools

    def forward_paged_ragged(self, params, tokens, pools, page_table, positions):
        """Single-token paged decode with per-row positions.

        tokens [B,1]; positions [B] = tokens already stored per row. Writes
        K/V through the page table, reads via the paged Pallas kernel.
        """
        cfg: LlamaConfig = self.config
        from mila_tpu.inference.kv_cache import paged_attention_read, paged_scatter

        B = tokens.shape[0]
        ps = pools["k"].shape[4]
        x = jnp.take(params["embed"]["wte"], tokens, axis=0)
        cos, sin = self._rope(positions[:, None])
        rows = jnp.arange(B)
        page_ids = page_table[rows, positions // ps]  # [B]
        offs = positions % ps
        lens = (positions + 1).astype(jnp.int32)
        for i in range(cfg.num_layers):
            blk = self.get(f"h{i}")
            bp = params[f"h{i}"]
            q, k, v = blk._qkv(bp, x)
            q = ops.apply_rope(q, cos, sin)
            k = ops.apply_rope(k, cos, sin)
            pools = paged_scatter(pools, i, page_ids, offs, k[:, 0], v[:, 0])
            att = paged_attention_read(pools, i, q, page_table, lens)
            x = blk._finish_attn(bp, x, att)
        return self._norm_logits(params, x), pools

    def forward_paged_chunk(self, params, tokens, pools, page_table, positions):
        """Multi-token paged forward with per-row start positions.

        tokens [B, t] (t small — speculative verify / chunked catch-up),
        positions [B] = tokens already stored per row. Token j of row b sits
        at absolute position positions[b] + j; K/V write through the page
        table, attention reads pages with per-(row, token) causal lengths by
        flattening the [B, t] queries to B*t rows for the paged kernel.
        Returns (logits [B, t, V], pools).
        """
        cfg: LlamaConfig = self.config
        from mila_tpu.inference.kv_cache import paged_attention_read, paged_scatter

        B, t = tokens.shape
        ps = pools["k"].shape[4]
        x = jnp.take(params["embed"]["wte"], tokens, axis=0)  # [B, t, H]
        pos_bt = positions[:, None] + jnp.arange(t)[None, :]  # [B, t]
        cos, sin = self._rope(pos_bt)
        page_ids = jnp.take_along_axis(page_table, pos_bt // ps, axis=1)
        offs = pos_bt % ps
        # Flattened-query view for the paged kernel: each of the B*t rows
        # attends to its own causal prefix length.
        flat_table = jnp.repeat(page_table, t, axis=0)  # [B*t, W]
        flat_lens = (pos_bt + 1).astype(jnp.int32).reshape(-1)  # [B*t]
        for i in range(cfg.num_layers):
            blk = self.get(f"h{i}")
            bp = params[f"h{i}"]
            q, k, v = blk._qkv(bp, x)
            q = ops.apply_rope(q, cos, sin)
            k = ops.apply_rope(k, cos, sin)
            pools = paged_scatter(pools, i, page_ids, offs, k, v)
            qf = q.reshape(B * t, 1, cfg.num_heads, cfg.hd)
            att = paged_attention_read(pools, i, qf, flat_table, flat_lens)
            att = att.reshape(B, t, cfg.num_heads, cfg.hd)
            x = blk._finish_attn(bp, x, att)
        return self._norm_logits(params, x), pools

    def forward_with_cache_ragged(self, params, tokens, cache, positions):
        """Single-token decode with per-row positions (continuous batching)."""
        cfg: LlamaConfig = self.config
        B = tokens.shape[0]
        x = jnp.take(params["embed"]["wte"], tokens, axis=0)  # [B,1,H]
        cos, sin = self._rope(positions[:, None])
        if B <= 32 and (
            "layer_stream" in params or "mega_pack" in params.get("h0", {})
        ):
            x, new_cache = self._backbone_fused_decode(
                params, x, cache, positions.astype(jnp.int32), cos, sin
            )
            return self._norm_logits(params, x), new_cache
        rows = jnp.arange(B)
        new_cache = {}
        for i in range(cfg.num_layers):
            blk = self.get(f"h{i}")
            bp = params[f"h{i}"]
            lc = cache[f"h{i}"]
            q, k, v = blk._qkv(bp, x)
            q = ops.apply_rope(q, cos, sin)
            k = ops.apply_rope(k, cos, sin)
            # In-place scatter on this layer's own carried buffer.
            k_cache = lc["k"].at[rows, positions].set(
                k[:, 0].astype(lc["k"].dtype)
            )
            v_cache = lc["v"].at[rows, positions].set(
                v[:, 0].astype(lc["v"].dtype)
            )
            from mila_tpu.kernels.dense_attention import dense_decode_attention

            att = dense_decode_attention(
                q, k_cache, v_cache, (positions + 1).astype(jnp.int32)
            )
            x = blk._finish_attn(bp, x, att)
            new_cache[f"h{i}"] = {"k": k_cache, "v": v_cache}
        return self._norm_logits(params, x), new_cache
