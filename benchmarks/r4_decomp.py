"""Round-4 decode-step decomposition for the CURRENT fused int8 path.

BENCH_r03 measured 2.81 ms/token (roofline bound 1.677) through the
megakernel wiring: per layer [fused_decode_attention] -> [mlp_qkv_fused],
plus layer-0 rms+wqkv, the argmax lm_head stream, the batched cache insert
and the fori_loop glue. This times each piece in isolation on chip so the
gap has an address (VERDICT r4 item 1).

Usage: python benchmarks/r4_decomp.py [--batch 8] [--ctx 512] [--live 192]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import benchmarks  # noqa: F401 - compile cache

import jax
import jax.numpy as jnp

from benchmarks.decode_sweep import timed_loop

# Llama-3.2-1B
NH, NKV, HD, H, I, V, L = 32, 8, 64, 2048, 8192, 129024, 16
KD = NKV * HD
NQ = NH * HD


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--live", type=int, default=192,
                    help="live cache rows (the bench decodes at ~128-256)")
    args = ap.parse_args()
    B, T, live = args.batch, args.ctx, args.live
    print("devices:", jax.devices(), file=sys.stderr)

    from mila_tpu.inference.quantize import quantize
    from mila_tpu.kernels.decode_fused import (
        rms_quant_linear,
        rms_quant_linear_argmax,
    )
    from mila_tpu.kernels.dense_attention import (
        fused_decode_attention,
        pack_queries,
    )
    from mila_tpu.kernels.layer_fused import mlp_qkv_fused, pack_layer

    key = jax.random.key(0)
    parts = {}

    def report(name, t, bytes_=0, mult=1):
        gbs = f"  {bytes_/t/1e9:6.0f} GB/s" if bytes_ else "             "
        print(f"{name:34s} {t*1e6:8.1f} us{gbs}  -> x{mult} = "
              f"{t*mult*1e3:6.3f} ms", flush=True)
        parts[name] = t * mult

    # --- layer-tail megakernel (wo|wgu|down|wqkv stream) ---
    wo_q = quantize(jax.random.normal(key, (H, H)) * 0.02, "int8")
    wgu_q = quantize(jax.random.normal(key, (H, 2 * I)) * 0.02, "int8")
    down_q = quantize(jax.random.normal(key, (I, H)) * 0.02, "int8")
    wqkv_q = quantize(jax.random.normal(key, (H, NQ + 2 * KD)) * 0.02, "int8")
    lp = pack_layer(wo_q, wgu_q, down_q, wqkv_q, bn=512)
    att = jax.random.normal(key, (B, H), jnp.bfloat16)
    xres = jax.random.normal(key, (B, H), jnp.bfloat16)
    gm = jnp.ones((H,), jnp.float32)
    tail_bytes = H * H + 2 * H * I + I * H + H * (NQ + 2 * KD)
    t = timed_loop(
        lambda a: mlp_qkv_fused(a, xres, gm, lp, gm, interpret=False)[0], att
    )
    report("mlp_qkv_fused (layer tail)", t, tail_bytes, L)

    # --- fused decode attention (stacked cache, in-kernel rope) ---
    qkv = jax.random.normal(key, (B, NQ + 2 * KD), jnp.bfloat16)
    kc = jax.random.normal(key, (B, T, NKV, HD), jnp.bfloat16)
    vc = jax.random.normal(key, (B, T, NKV, HD), jnp.bfloat16)
    old_lens = jnp.full((B,), live, jnp.int32)
    cos_t = jnp.ones((B, KD), jnp.float32)
    sin_t = jnp.zeros((B, KD), jnp.float32)

    def att_step(qkv):
        q_pk = pack_queries(qkv[:, :NQ].reshape(B, NH, HD), NKV)
        a, kn, _kc, _vc = fused_decode_attention(
            qkv, q_pk, cos_t, sin_t, kc, vc, old_lens,
            num_heads=NH, interpret=False)
        return a.reshape(B, NQ) + kn[:, :1] * 0

    # live rows rounded up to the 128-block the kernel actually streams
    live_blk = -(-live // 128) * 128
    att_bytes = 2 * B * live_blk * KD * 2
    t = timed_loop(att_step, qkv)
    report("fused_decode_attention", t, att_bytes, L)

    # --- layer-0 rms+wqkv stream ---
    x0 = jax.random.normal(key, (B, 1, H), jnp.bfloat16)
    t = timed_loop(
        lambda x: rms_quant_linear(x, gm, wqkv_q, eps=1e-5,
                                   interpret=False), x0
    )
    report("rms_quant_linear (layer-0 qkv)", t, H * (NQ + 2 * KD), 1)

    # --- lm_head argmax stream ---
    head_q = quantize(jax.random.normal(key, (H, V)) * 0.02, "int8")
    xh = jax.random.normal(key, (B, H), jnp.bfloat16)
    t = timed_loop(
        lambda x: rms_quant_linear_argmax(
            x, gm, head_q, vocab_size=128256, interpret=False
        ).astype(jnp.bfloat16), xh
    )
    report("lm_head argmax stream", t, H * V, 1)

    # --- batched cache insert (2 stacked DUS) + embed gather ---
    kn = jax.random.normal(key, (L, B, 1, NKV, HD), jnp.bfloat16)

    def insert(kn):
        a = jax.lax.dynamic_update_slice(kc, kn, (0, 0, live, 0, 0))
        b = jax.lax.dynamic_update_slice(vc, kn, (0, 0, live, 0, 0))
        return kn + a[0, :, :1, 0, :1] * 1e-20 + b[0, :, :1, 0, :1] * 1e-20

    t = timed_loop(insert, kn)
    report("cache insert (k+v stacked DUS)", t, 0, 1)

    wte = jax.random.normal(key, (V, H), jnp.bfloat16)
    tok = jnp.zeros((B, 1), jnp.int32)

    def emb(tok, wte):
        x = jnp.take(wte, tok, axis=0)
        return tok + (x.sum() * 1e-20).astype(jnp.int32)

    t = timed_loop(emb, tok, wte)
    report("embed gather", t, 0, 1)

    total = sum(parts.values())
    print(f"\nsum of parts: {total*1e3:.3f} ms "
          f"(BENCH_r03 whole step: 2.81 ms; roofline 1.677 ms)", flush=True)
    wbytes = (tail_bytes * L + H * (NQ + 2 * KD) + H * V)
    print(f"weight bytes {wbytes/1e6:.0f} MB -> roofline "
          f"{wbytes/819e9*1e3:.3f} ms; KV live bytes "
          f"{att_bytes*L/1e6:.0f} MB -> {att_bytes*L/819e9*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
