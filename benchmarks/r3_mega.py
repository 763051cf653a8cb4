"""On-chip benchmark for the decode megakernels at Llama-1B shapes.

Usage: python benchmarks/r3_mega.py [--batch 8] [--bn 1024,2048] [--dtypes int8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import benchmarks  # noqa: F401

import jax
import jax.numpy as jnp

from benchmarks.decode_sweep import timed_loop


def bench_attn(batch):
    from mila_tpu.kernels.dense_attention import dense_decode_attention

    key = jax.random.key(0)
    B, NKV, NH, T, HD = batch, 8, 32, 512, 64
    q = jax.random.normal(key, (B, 1, NH, HD), jnp.bfloat16)
    kc = jax.random.normal(key, (B, T, NKV, HD), jnp.bfloat16)
    vc = jax.random.normal(key, (B, T, NKV, HD), jnp.bfloat16)
    lens = jnp.full((B,), T, jnp.int32)
    for bt in (128, 256, 512):
        t0 = time.time()
        try:
            t = timed_loop(
                lambda q: dense_decode_attention(q, kc, vc, lens, block_t=bt,
                                                 interpret=False), q)
        except Exception as e:  # noqa: BLE001
            print(f"attn bt={bt}: ERR {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        by = 2 * B * NKV * T * HD * 2
        print(f"attn bt={bt}: {t*1e6:6.1f} us  {by/t/1e9:5.0f} GB/s "
              f"[{time.time()-t0:.0f}s]", flush=True)


def bench_head(batch):
    from mila_tpu.inference.quantize import quant_linear_ref, quantize
    from mila_tpu.kernels.decode_fused import (
        rms_quant_linear, rms_quant_linear_argmax,
    )

    key = jax.random.key(0)
    H, V = 2048, 129024
    x = jax.random.normal(key, (batch, H), jnp.bfloat16)
    gm = jnp.ones((H,), jnp.float32)
    qt = quantize(jax.random.normal(key, (H, V)) * 0.02, "int8")
    by = H * V
    t0 = time.time()
    t = timed_loop(lambda x: rms_quant_linear(x, gm, qt, interpret=False), x)
    print(f"head rms_quant_linear:  {t*1e6:6.1f} us  {by/t/1e9:5.0f} GB/s "
          f"[{time.time()-t0:.0f}s]", flush=True)
    t0 = time.time()
    t = timed_loop(
        lambda x: rms_quant_linear_argmax(
            x, gm, qt, vocab_size=128256, interpret=False
        ).astype(jnp.bfloat16), x)
    print(f"head +argmax fused:     {t*1e6:6.1f} us  {by/t/1e9:5.0f} GB/s "
          f"[{time.time()-t0:.0f}s]", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bn", default="1024,2048")
    ap.add_argument("--dtypes", default="int8")
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--what", default="mlp", help="mlp,attn,head")
    args = ap.parse_args()
    print("devices:", jax.devices(), file=sys.stderr)

    from mila_tpu.inference.quantize import quantize
    from mila_tpu.kernels.decode_mlp import mlp_block_fused, pack_mlp

    if "attn" in args.what:
        bench_attn(args.batch)
    if "head" in args.what:
        bench_head(args.batch)
    if "mlp" not in args.what:
        return

    M, H, I = args.batch, 2048, 8192
    key = jax.random.key(0)
    att = jax.random.normal(key, (M, H), jnp.bfloat16)
    x = jax.random.normal(key, (M, H), jnp.bfloat16)
    gamma = jnp.ones((H,), jnp.float32)
    w_bytes = H * H + H * 2 * I + I * H

    for dt in args.dtypes.split(","):
        wo = quantize(jax.random.normal(key, (H, H)) * 0.02, dt)
        wgu = quantize(jax.random.normal(key, (H, 2 * I)) * 0.02, dt)
        down = quantize(jax.random.normal(key, (I, H)) * 0.02, dt)
        for bn in (int(b) for b in args.bn.split(",")):
            pack = pack_mlp(wo, wgu, down, bn=bn)
            assert pack is not None
            jax.block_until_ready(pack.w)
            t0 = time.time()
            try:
                t = timed_loop(
                    lambda a: mlp_block_fused(a, x, gamma, pack,
                                              depth=args.depth,
                                              interpret=False),
                    att,
                )
            except Exception as e:  # noqa: BLE001
                print(f"{dt} bn={bn}: ERR {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                continue
            gbs = w_bytes / t / 1e9
            print(f"{dt} bn={bn}: {t*1e6:7.1f} us  {gbs:6.0f} GB/s "
                  f"({w_bytes/1e6:.1f} MB)  [{time.time()-t0:.0f}s]",
                  flush=True)


if __name__ == "__main__":
    main()
