"""Grid tail kernel tile-size sweep: bn=512 vs bn=1024 (+ old kernel ref).

Usage: python benchmarks/r4_stream2.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import benchmarks  # noqa: F401

import jax
import jax.numpy as jnp

from benchmarks.decode_sweep import timed_loop

B, H, I = 8, 2048, 8192
KD, NQ = 512, 2048
NQKV = NQ + 2 * KD


def main():
    from mila_tpu.inference.quantize import quantize
    from mila_tpu.kernels.layer_fused import pack_layer
    from mila_tpu.kernels.layer_stream import (
        layer_tail_stream,
        pack_layer_stream,
    )

    key = jax.random.key(0)
    wo_q = quantize(jax.random.normal(key, (H, H)) * 0.02, "int8")
    wgu_q = quantize(jax.random.normal(key, (H, 2 * I)) * 0.02, "int8")
    down_q = quantize(jax.random.normal(key, (I, H)) * 0.02, "int8")
    wqkv_q = quantize(jax.random.normal(key, (H, NQKV)) * 0.02, "int8")
    att = jax.random.normal(key, (B, H), jnp.bfloat16)
    xres = jax.random.normal(key, (B, H), jnp.bfloat16)
    gm = jnp.ones((H,), jnp.float32)
    tail_bytes = H * H + 2 * H * I + I * H + H * NQKV

    for bn in (512, 1024):
        packs = [pack_layer(wo_q, wgu_q, down_q, wqkv_q, bn=bn)
                 for _ in range(2)]
        packs.append(pack_layer(wo_q, wgu_q, down_q, None, bn=bn))
        stream = pack_layer_stream(packs)
        if stream is None:
            print(f"bn={bn}: pack failed", flush=True)
            continue
        t = timed_loop(
            lambda a, st=stream: layer_tail_stream(
                a, xres, gm, st, 0, gm, interpret=False)[0], att
        )
        print(f"layer_tail_stream bn={bn:5d}:  {t*1e6:8.1f} us  "
              f"{tail_bytes/t/1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    main()
