"""Is the stacked-cache insert in-place when the cache is a loop carry?

r4_decomp measured the batched [L,B,T,NKV,HD] dynamic_update_slice at
3.29 ms standalone — but there the cache was a non-donated operand, forcing
a 2x268MB copy. The decode loop carries the cache through fori_loop, where
XLA buffer assignment can update in place. This measures both, plus the
new grid-based layer_tail_stream kernel vs the old unrolled megakernel.

Usage: python benchmarks/r4_insert.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import benchmarks  # noqa: F401

import jax
import jax.numpy as jnp

from benchmarks.decode_sweep import timed_loop

L, B, T, NKV, HD = 16, 8, 512, 8, 64
H, I = 2048, 8192
KD, NQ = NKV * HD, 32 * HD


def bench_carried_insert():
    key = jax.random.key(0)
    kc = jax.random.normal(key, (L, B, T, NKV, HD), jnp.bfloat16)
    vc = jax.random.normal(key, (L, B, T, NKV, HD), jnp.bfloat16)
    kn = jax.random.normal(key, (L, B, 1, NKV, HD), jnp.bfloat16)

    @jax.jit
    def chain(n, kc, vc, kn):
        def body(i, carry):
            kc, vc = carry
            pos = jax.lax.rem(i, T - 1)
            kc = jax.lax.dynamic_update_slice(
                kc, kn + (kc[0, 0, 0, 0, 0] * 1e-20).astype(kn.dtype),
                (0, 0, pos, 0, 0))
            vc = jax.lax.dynamic_update_slice(vc, kn, (0, 0, pos, 0, 0))
            return kc, vc

        kc, vc = jax.lax.fori_loop(0, n, body, (kc, vc))
        return (kc[0, 0, 0, 0, 0] + vc[0, 0, 0, 0, 0]).astype(jnp.float32)

    float(chain(jnp.int32(2), kc, vc, kn))

    def best(n, reps=3):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(jnp.int32(n), kc, vc, kn))
            b = min(b, time.perf_counter() - t0)
        return b

    best(64)
    t1, t2 = best(64), best(256)
    per = (t2 - t1) / 192
    print(f"carried stacked insert (k+v):       {per*1e6:8.1f} us", flush=True)


def bench_layer_stream():
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
    wqkv_q = quantize(jax.random.normal(key, (H, NQ + 2 * KD)) * 0.02, "int8")
    packs = [pack_layer(wo_q, wgu_q, down_q, wqkv_q, bn=512)
             for _ in range(2)]
    packs.append(pack_layer(wo_q, wgu_q, down_q, None, bn=512))
    stream = pack_layer_stream(packs)
    att = jax.random.normal(key, (B, H), jnp.bfloat16)
    xres = jax.random.normal(key, (B, H), jnp.bfloat16)
    gm = jnp.ones((H,), jnp.float32)
    tail_bytes = H * H + 2 * H * I + I * H + H * (NQ + 2 * KD)
    t = timed_loop(
        lambda a: layer_tail_stream(a, xres, gm, stream, 0, gm,
                                    interpret=False)[0], att
    )
    print(f"layer_tail_stream (grid kernel):    {t*1e6:8.1f} us  "
          f"{tail_bytes/t/1e9:6.0f} GB/s  -> x{L} = {t*L*1e3:6.3f} ms",
          flush=True)
    tail_bytes_last = H * H + 2 * H * I + I * H
    t = timed_loop(
        lambda a: layer_tail_stream(a, xres, gm, stream, 2, None,
                                    interpret=False)[0], att
    )
    print(f"layer_tail_stream (last layer):     {t*1e6:8.1f} us  "
          f"{tail_bytes_last/t/1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    bench_layer_stream()
    bench_carried_insert()
