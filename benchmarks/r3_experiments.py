"""Round-3 kernel experiments: what limits the decode weight stream?

Hypotheses (from the r2 sweep numbers 568-743 GB/s vs 819 peak):
  (a) per-tile compute — the int8->bf16 VPU cast — slightly exceeds the
      tile DMA time, so big-grid shapes (wgu) cap at ~730 GB/s;
  (b) small shapes (wo, wqkv) additionally lose the pipeline prologue
      (first DMA unoverlapped) across 4+1 separate pallas_calls per layer.

Variants timed at the wgu/wo decode shapes (M=8):
  base      astype(bf16) then dot            (current kernel)
  mixed     dot_general(bf16 x, int8 w)      (Mosaic converts in the dot?)
  f32       astype(f32) then f32 dot
  a8        int8 x (pre-quantized), int8xint8 -> int32 MXU dot
  stream    DMA + one-lane touch only        (per-shape achievable ceiling)

Usage: python benchmarks/r3_experiments.py [--shapes wgu,wo] [--variants ...]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import benchmarks  # noqa: F401

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.decode_sweep import DECODE_SHAPES, hbm_read_bw, timed_loop


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k, variant):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...]
    x = x_ref[...]
    if variant == "base":
        p = jax.lax.dot(x, w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    elif variant == "mixed":
        p = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    elif variant == "f32":
        p = jax.lax.dot(x.astype(jnp.float32), w.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    elif variant == "a8":
        p = jax.lax.dot(x, w, preferred_element_type=jnp.int32).astype(
            jnp.float32)
    elif variant == "stream":
        p = w[:1].astype(jnp.float32).sum(axis=0, keepdims=True) * jnp.ones(
            (acc_ref.shape[0], 1), jnp.float32)
    else:
        raise ValueError(variant)
    acc_ref[...] += p * s_ref[0][None, :]

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def run_variant(variant, M, K, N, bn, bk):
    key = jax.random.key(0)
    if variant == "a8":
        x = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
    else:
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    s = jnp.ones((1, N), jnp.float32)
    n_k = K // bk

    def call(x):
        return pl.pallas_call(
            functools.partial(_kernel, n_k=n_k, variant=variant),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            grid=(N // bn, n_k),
            in_specs=[
                pl.BlockSpec((M, bk), lambda ni, ki: (0, ki)),
                pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni)),
                pl.BlockSpec((1, bn), lambda ni, ki: (0, ni)),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda ni, ki: (0, ni)),
            scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(x, w, s)

    t = timed_loop(call, x)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="wgu,wo")
    ap.add_argument("--variants", default="base,mixed,a8,stream")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bw", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices(), file=sys.stderr)

    if args.bw:
        t0 = time.time()
        bw = hbm_read_bw()
        print(f"pure-stream HBM read: {bw/1e9:.0f} GB/s [{time.time()-t0:.0f}s]",
              flush=True)

    tiles = {"wgu": (1024, 2048), "wo": (1024, 1024), "wqkv": (1024, 2048),
             "down": (1024, 2048), "lm_head": (1536, 2048)}
    for name in args.shapes.split(","):
        K, N = DECODE_SHAPES[name]
        bn, bk = tiles[name]
        print(f"\n== {name} K={K} N={N} tile=({bn},{bk}) M={args.batch} ==",
              flush=True)
        for v in args.variants.split(","):
            t0 = time.time()
            try:
                t = run_variant(v, args.batch, K, N, bn, bk)
            except Exception as e:  # noqa: BLE001
                print(f"  {v:8s}: ERR {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                continue
            gbs = K * N / t / 1e9
            print(f"  {v:8s}: {t*1e6:8.1f} us  {gbs:6.0f} GB/s "
                  f"[{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
