"""Llama-3.2-1B inference benchmark: decode tokens/s/chip + prefill TTFT,
BF16 vs INT8 weight-only (BASELINE configs 4-5 single-chip measurements).

Weights are random-initialized (zero-egress environment); throughput is
weight-independent. Decode steps run inside one jitted lax.scan so the
tunneled host's dispatch overhead doesn't pollute per-token numbers.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def build_model(scale: str, dtype: str):
    from mila_tpu.models.llama import Llama, LlamaConfig

    if scale == "gpt2-124m":
        # BASELINE config 2: GPT-2 124M BF16 greedy decode.
        from mila_tpu.models.gpt2 import GPT2, GPT2Config

        cfg = GPT2Config.gpt2_124m().replace(max_seq_len=1024, param_dtype=dtype)
        model = GPT2(cfg)
        params = model.init(jax.random.key(0), (1, 32))
        return model, params, cfg
    if scale == "1b":
        cfg = LlamaConfig.llama32_1b().replace(
            max_seq_len=2048, param_dtype=dtype
        )
    elif scale == "small":
        cfg = LlamaConfig(
            name="llama-small", vocab_size=32000, hidden_size=1024,
            intermediate_size=4096, num_layers=8, num_heads=16, num_kv_heads=4,
            max_seq_len=2048, param_dtype=dtype,
        )
    else:
        cfg = LlamaConfig.tiny()
    model = Llama(cfg)
    params = model.init(jax.random.key(0), (1, 32))
    return model, params, cfg


def scan_decode_fn(model):
    """Jitted greedy-decode loop with a *traced* step count: one compile
    serves both timing lengths (remote compiles dominate bench wall time).

    Uses the model's greedy step (argmax fused into the quantized lm_head
    stream where available) — the production greedy path. When the cache is
    a stacked (k_pool, v_pool) tuple the whole step runs as ONE Pallas
    kernel (model.giga_step, kernels/decode_giga.py)."""
    base_step = getattr(model, "greedy_step_with_cache", None)

    def plain_step(params, token, cache, pos):
        logits, cache = model.forward_with_cache(params, token, cache, pos)
        nxt = jnp.argmax(
            logits[:, -1, : model.config.vocab_size], axis=-1
        ).astype(jnp.int32)[:, None]
        return nxt, cache

    base_step = base_step or plain_step

    def step(params, token, cache, pos):
        if isinstance(cache, tuple):  # giga path: stacked pools
            B = token.shape[0]
            lens = jnp.full((B,), 0, jnp.int32) + pos
            tok, _logits, kp, vp = model.giga_step(
                params, token, cache[0], cache[1], lens)
            return tok, (kp, vp)
        return base_step(params, token, cache, pos)

    def run(params, first_token, cache, start_pos, steps):
        def body(_, carry):
            token, cache, pos, acc = carry
            nxt, cache = step(params, token, cache, pos)
            return (nxt, cache, pos + 1, acc + nxt[:, 0].sum())

        tok, cache, _, acc = jax.lax.fori_loop(
            0, steps, body, (first_token, cache, start_pos, jnp.int32(0))
        )
        # acc: scalar fetch forces completion. The cache is DONATED and
        # returned: a non-donated cache argument defeats XLA's in-place
        # dynamic-update-slice inside the loop — measured 444 us/step of
        # silent full-cache copies at Llama-1B shapes (benchmarks/r4_dus.py,
        # the r3 decode regression's root cause).
        return acc, cache

    return jax.jit(run, donate_argnums=(2,))


# v5e public spec peaks.
PEAK_HBM_GBS = 819.0
PEAK_BF16_TFLOPS = 197.0


def qtensor_stream_bytes(leaf) -> int:
    q = leaf.q
    nb = q.size // 2 if jnp.dtype(q.dtype) == jnp.dtype("int4") else q.nbytes
    return nb + leaf.scale.nbytes


def decode_step_bytes(params, cfg, batch: int, cache_len: int,
                      kv_bytes_per_el: int = 2) -> dict:
    """Mandatory HBM traffic of one decode step: streamed weight bytes +
    KV-cache read bytes (the roofline denominator for bench.py)."""
    if "giga_pack" in params:
        # The giga stream IS the decode-path weight image (fp8/int4 are
        # re-expressed as int8 tiles at pack time — requant.py): count the
        # bytes actually mandatory for the chosen representation.
        gp = params["giga_pack"]
        weight = gp.w.nbytes + gp.s.nbytes
        nkv = getattr(cfg, "num_kv_heads", getattr(cfg, "num_heads", 1))
        H = getattr(cfg, "hidden_size", 0)
        hd = cfg.hd if hasattr(cfg, "hd") else H // cfg.num_heads
        kv = (2 * batch * cache_len * nkv * hd * kv_bytes_per_el
              * cfg.num_layers)
        return {"weight_bytes": int(weight), "kv_read_bytes": int(kv)}
    weight = 0
    has_qhead = type(params.get("lm_head_q")).__name__ == "QTensor"
    for name, sub in params.items():
        if name == "embed":
            if not has_qhead and "lm_head" not in params:
                # tied head streams the bf16 wte matrix every step
                weight += sub["wte"].nbytes
            continue
        for leaf in jax.tree_util.tree_leaves(
            sub, is_leaf=lambda x: type(x).__name__ == "QTensor"
        ):
            if type(leaf).__name__ == "QTensor":
                weight += qtensor_stream_bytes(leaf)
            elif hasattr(leaf, "ndim") and leaf.ndim == 2:
                weight += leaf.nbytes
            # 1-D gammas/biases are noise at these scales
    nkv = getattr(cfg, "num_kv_heads", getattr(cfg, "num_heads", 1))
    H = getattr(cfg, "hidden_size", getattr(cfg, "embedding_dim", 0))
    hd = cfg.hd if hasattr(cfg, "hd") else H // cfg.num_heads
    n_layers = getattr(cfg, "num_layers", 0)
    kv = 2 * batch * cache_len * nkv * hd * kv_bytes_per_el * n_layers
    return {"weight_bytes": int(weight), "kv_read_bytes": int(kv)}


def decode_flops(cfg, batch: int, cache_len: int) -> float:
    H = getattr(cfg, "hidden_size", getattr(cfg, "embedding_dim", 0))
    I = getattr(cfg, "intermediate_size", getattr(cfg, "mlp_ratio", 4) * H)
    nh = cfg.num_heads
    nkv = getattr(cfg, "num_kv_heads", nh)
    hd = cfg.hd if hasattr(cfg, "hd") else H // nh
    n_mlp = 3 if hasattr(cfg, "intermediate_size") else 2  # swiglu vs gelu MLP
    per_layer = 2 * (H * (nh + 2 * nkv) * hd + nh * hd * H + n_mlp * H * I)
    attn = 4 * nh * hd * cache_len  # qk + av per token
    head = 2 * H * cfg.vocab_size
    return batch * (cfg.num_layers * (per_layer + attn) + head)


def bench_decode(model, params, cfg, batch: int, prompt_len: int = 128,
                 decode_steps: int = 64, cache_len: int = 512):
    prefill = jax.jit(
        lambda p, t, c: model.forward_with_cache(p, t, c, 0)[0].sum()
    )
    key = jax.random.key(1)
    prompt = jax.random.randint(key, (batch, prompt_len), 0, cfg.vocab_size)
    cache = model.init_kv_cache(batch, cache_len, jnp.bfloat16)

    # TTFT: prefill wall time (after compile), forced fetch.
    float(prefill(params, prompt, cache))  # compile
    ttfts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(prefill(params, prompt, cache))
        ttfts.append(time.perf_counter() - t0)
    ttft = sorted(ttfts)[1]

    # Decode: delta timing between n and 2n loop steps (one compile).
    _, cache2 = jax.jit(
        lambda p, t, c: model.forward_with_cache(p, t, c, 0)
    )(params, prompt, cache)
    if "giga_pack" in params and hasattr(model, "stack_kv_cache"):
        # Whole-model single-kernel decode: stacked pools (one-time copy).
        cache2 = jax.jit(model.stack_kv_cache)(cache2)
    token = jnp.zeros((batch, 1), jnp.int32)
    f = scan_decode_fn(model)
    # The cache is donated into every call and threaded back out.
    acc, cache2 = f(params, token, cache2, prompt_len, jnp.int32(2))
    float(acc)  # compile + warm

    def best(steps, reps=3):
        nonlocal cache2
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            acc, cache2 = f(params, token, cache2, prompt_len,
                            jnp.int32(steps))
            float(acc)
            b = min(b, time.perf_counter() - t0)
        return b

    best(decode_steps)  # warm
    t1, t2 = best(decode_steps), best(decode_steps * 2)
    per_tok = max((t2 - t1) / decode_steps, 1e-9)

    # Self-grading: fraction of the HBM roofline this decode step achieves.
    by = decode_step_bytes(params, cfg, batch, cache_len)
    mand = by["weight_bytes"] + by["kv_read_bytes"]
    t_roof = mand / (PEAK_HBM_GBS * 1e9)
    mfu = decode_flops(cfg, batch, cache_len) / per_tok / (PEAK_BF16_TFLOPS * 1e12)
    return {
        "ttft_p50_ms": round(ttft * 1e3, 2),
        "decode_tok_s_per_seq": round(1.0 / per_tok, 1),
        "decode_tok_s_total": round(batch / per_tok, 1),
        "per_token_ms": round(per_tok * 1e3, 3),
        "roofline_frac": round(t_roof / per_tok, 3),
        "roofline_ms": round(t_roof * 1e3, 3),
        "hbm_gbs": round(mand / per_tok / 1e9, 1),
        "mfu": round(mfu, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="1b",
                    choices=["1b", "small", "tiny", "gpt2-124m"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--quantize", default="both", choices=["bf16", "int8", "both"])
    ap.add_argument("--fuse", action="store_true",
                    help="fuse wqkv/wgu projections before (optional) quantization")
    args = ap.parse_args()

    import mila_tpu
    from mila_tpu.inference.quantize import model_bytes, quantize_model_params
    from mila_tpu.runtime.memory import format_bytes

    mila_tpu.initialize(0)
    print("devices:", jax.devices(), file=sys.stderr)
    model, params, cfg = build_model(args.scale, "bfloat16")
    if args.fuse and args.scale != "gpt2-124m":
        from mila_tpu.models.llama import fuse_llama_projections

        params = fuse_llama_projections(params)
        print("fused wqkv/wgu projections", file=sys.stderr)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"model {cfg.name}: {n_params/1e9:.2f}B params, "
          f"{format_bytes(model_bytes(params))} bf16", file=sys.stderr)

    results = {}
    if args.quantize in ("bf16", "both"):
        r = bench_decode(model, params, cfg, args.batch, args.prompt_len)
        print(f"bf16   b={args.batch}: {r}", file=sys.stderr)
        results["bf16"] = r
    if args.quantize in ("int8", "both"):
        qparams = quantize_model_params(params, "int8")
        if getattr(model.config, "tie_embeddings", False) and args.scale != "gpt2-124m":
            from mila_tpu.models.llama import (
                add_quantized_lm_head,
                pack_decode_layers,
            )

            qparams = add_quantized_lm_head(qparams, "int8")
            print("added quantized lm_head", file=sys.stderr)
            if args.fuse:
                qparams = pack_decode_layers(qparams)
                print("packed decode layers (megakernel path)", file=sys.stderr)
        print(f"int8 weights: {format_bytes(model_bytes(qparams))}", file=sys.stderr)
        r = bench_decode(model, qparams, cfg, args.batch, args.prompt_len)
        print(f"int8   b={args.batch}: {r}", file=sys.stderr)
        results["int8"] = r

    pick = results.get("int8") or results["bf16"]
    print(json.dumps({
        "metric": f"llama_{args.scale}_int8_decode" if "int8" in results
        else f"llama_{args.scale}_bf16_decode",
        "value": pick["decode_tok_s_total"],
        "unit": "tokens/sec/chip",
        "vs_baseline": round(
            results["int8"]["decode_tok_s_total"] / results["bf16"]["decode_tok_s_total"], 3
        ) if len(results) == 2 else 1.0,
        "detail": results,
    }))


if __name__ == "__main__":
    main()
