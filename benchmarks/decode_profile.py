"""Attribute the Llama-1B INT8 decode step time (roadmap: profile traces).

Strategy (the tunneled chip's delta timing is only reliable when the timed
delta is >> host jitter, so):
  1. layer-count scaling: decode step time at L in {1, 2, 4, 16} — the slope
     is the per-block cost, the intercept is lm_head + embed/sampling;
  2. attention-only scan at the bench's cache length;
  3. focused quant-matmul sweep with iteration counts auto-scaled so the
     measured delta is >= ~15 ms.

Usage: python benchmarks/decode_profile.py [--batch 8] [--what attr|sweep]
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from benchmarks.kernel_bench import timed_chain

# Llama-3.2-1B fused decode shapes (K, N, count per step).
DECODE_SHAPES = [
    ("wqkv", 2048, 3072, 16),
    ("wo", 2048, 2048, 16),
    ("wgu", 2048, 16384, 16),
    ("down", 8192, 2048, 16),
    ("lm_head", 2048, 129024, 1),  # padded to /2048 (128256 shrinks bn to 256)
]


def robust_time(fn, args, target_delta_s=0.015):
    """timed_chain with iteration count scaled until the delta is solid."""
    t = timed_chain(fn, args, iters=32)
    if t * 24 < target_delta_s:  # 24 = (n2-n1) at iters=32
        iters = max(48, int(target_delta_s / max(t, 1e-7) * 4 / 3))
        iters = min(iters, 2048)
        t = timed_chain(fn, args, iters=iters)
    return t


def sweep_shape(M, K, N, configs=None):
    from mila_tpu.inference.quantize import quantize
    from mila_tpu.kernels.quant_matmul import quant_linear

    key = jax.random.key(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.normal(key, (K, N)) * 0.02
    qt = quantize(w, "int8")
    if configs is None:
        # bn*bk int8 capped at 4MB (double-buffered 8MB < ~16MB VMEM/core).
        configs = [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
                   (2048, 512), (2048, 1024), (2048, 2048), (256, 512),
                   (4096, 512), (4096, 1024), (8192, 512), (1024, 2048),
                   (512, 2048), (512, 4096), (1024, 4096), (256, 8192)]
    results = {}
    t = robust_time(
        lambda x: jnp.matmul(
            x, (qt.q.astype(jnp.bfloat16) * qt.scale.astype(jnp.bfloat16)),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16),
        (x,),
    )
    results["xla_dequant"] = t
    for bn, bk in configs:
        if bn > N or bk > K or (N % bn) or (K % bk):
            continue
        try:
            t = robust_time(
                functools.partial(
                    lambda x, qt: quant_linear(
                        x, qt, block_m=M, block_n=bn, block_k=bk,
                        interpret=False,
                    ),
                    qt=qt,
                ),
                (x,),
            )
            results[f"bn{bn}_bk{bk}"] = t
        except Exception as e:  # noqa: BLE001 - remote compile hiccups
            results[f"bn{bn}_bk{bk}"] = f"ERR {type(e).__name__}"
    w_bytes = K * N
    print(f"\n== M={M} K={K} N={N} (weight {w_bytes/1e6:.1f} MB int8) ==",
          flush=True)
    best = None
    for name, t in sorted(
        results.items(), key=lambda kv: kv[1] if isinstance(kv[1], float) else 1e9
    ):
        if isinstance(t, str):
            print(f"  {name:18s} {t}", flush=True)
        else:
            print(f"  {name:18s} {t*1e6:9.1f} us   {w_bytes/t/1e9:6.0f} GB/s wstream",
                  flush=True)
            if best is None:
                best = (name, t)
    return results, best


def step_time(num_layers, batch, prompt_len=128, cache_len=512):
    """Per-token decode time for a 1B-config model truncated to num_layers."""
    from benchmarks.llama_bench import bench_decode
    from mila_tpu.inference.quantize import quantize_model_params
    from mila_tpu.models.llama import (
        Llama,
        LlamaConfig,
        add_quantized_lm_head,
        fuse_llama_projections,
        pack_decode_layers,
    )

    cfg = LlamaConfig.llama32_1b().replace(
        max_seq_len=2048, num_layers=num_layers, param_dtype="bfloat16"
    )
    model = Llama(cfg)
    params = model.init(jax.random.key(0), (1, 32))
    params = fuse_llama_projections(params)
    qparams = pack_decode_layers(
        add_quantized_lm_head(quantize_model_params(params, "int8"), "int8")
    )
    r = bench_decode(model, qparams, cfg, batch=batch, prompt_len=prompt_len,
                     cache_len=cache_len)
    return r["per_token_ms"] / 1e3, r


def attribute(batch, cache_len=512, prompt_len=128):
    from mila_tpu.ops import decode_attention

    print("\n-- layer-count scaling --", flush=True)
    times = {}
    for L in (1, 2, 4, 16):
        t, r = step_time(L, batch, prompt_len, cache_len)
        times[L] = t
        print(f"  L={L:3d}: {t*1e3:7.3f} ms/step  ({r['decode_tok_s_total']} tok/s)",
              flush=True)
    # least-squares slope/intercept over the L points
    import numpy as np

    Ls = np.array(sorted(times))
    ys = np.array([times[L] for L in Ls])
    slope, intercept = np.polyfit(Ls, ys, 1)
    print(f"  per-block: {slope*1e3:.3f} ms   head+overhead: {intercept*1e3:.3f} ms",
          flush=True)

    # Attention-only at the same cache length.
    NKV, HD, NH = 8, 64, 32
    q = jax.random.normal(jax.random.key(1), (batch, 1, NH, HD), jnp.bfloat16)
    k_cache = jax.random.normal(jax.random.key(2), (batch, cache_len, NKV, HD), jnp.bfloat16)
    v_cache = jax.random.normal(jax.random.key(3), (batch, cache_len, NKV, HD), jnp.bfloat16)
    lens = jnp.full((batch,), prompt_len + 32, jnp.int32)
    t_att = robust_time(lambda q: decode_attention(q, k_cache, v_cache, lens), (q,))
    print(f"  decode_attention/layer: {t_att*1e6:.1f} us "
          f"(x16 = {t_att*16*1e3:.3f} ms)", flush=True)

    # Per-block weight-stream roofline.
    blk_bytes = 2048 * 3072 + 2048 * 2048 + 2048 * 16384 + 8192 * 2048
    print(f"  per-block weight bytes: {blk_bytes/1e6:.1f} MB int8 "
          f"(roofline @819GB/s: {blk_bytes/819e9*1e3:.3f} ms)", flush=True)
    head_bytes = 2048 * 128256
    print(f"  lm_head weight bytes: {head_bytes/1e6:.1f} MB int8 "
          f"(roofline: {head_bytes/819e9*1e3:.3f} ms)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--what", default="attr", choices=["sweep", "attr"])
    args = ap.parse_args()
    import mila_tpu

    mila_tpu.initialize(0)
    print("devices:", jax.devices(), file=sys.stderr)
    if args.what == "sweep":
        for name, K, N, _ in DECODE_SHAPES:
            sweep_shape(args.batch, K, N)
    else:
        attribute(args.batch)


if __name__ == "__main__":
    main()
