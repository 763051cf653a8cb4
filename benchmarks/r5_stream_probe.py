"""What floors the int8 weight stream at ~141 us/layer vs the 74 us DMA
bound? (r5_mega.py measured mega == stream == 141 us/layer, so the kernel
boundary is NOT the cost — the stream itself is.)

Streams the SAME 58MB of int8 tiles [2048, 512] through a grid kernel
three ways:
  dma   — tiles only touched by a trivial reduction (pure-bandwidth floor)
  bf16  — current path: int8 -> bf16 VPU convert, bf16 MXU matmul (M=8)
  int8  — W8A8: int8 @ int8 -> int32 MXU direct, f32 scale epilogue

Usage: python benchmarks/r5_stream_probe.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import benchmarks  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BK, BN, NT = 2048, 512, 58  # one Llama-1B layer's int8 tile stream
B = 8


def make_kernel(mode):
    def kern(x_ref, xq_ref, w_ref, o_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        if mode == "dma":
            # touch one row so the fetch can't be elided
            acc_ref[...] += w_ref[0, :1, :].astype(jnp.float32)
        elif mode == "bf16":
            w = w_ref[0].astype(jnp.bfloat16)
            p = jax.lax.dot(x_ref[...], w,
                            preferred_element_type=jnp.float32)
            acc_ref[...] += p[:1, :]
        elif mode == "int8":
            p = jax.lax.dot(xq_ref[...], w_ref[0],
                            preferred_element_type=jnp.int32)
            acc_ref[...] += p[:1, :].astype(jnp.float32) * 0.01
        elif mode == "fp8-bitdecode":
            from mila_tpu.kernels.quant_matmul import _load_w
            w = _load_w(w_ref[0])
            p = jax.lax.dot(x_ref[...], w,
                            preferred_element_type=jnp.float32)
            acc_ref[...] += p[:1, :]
        elif mode == "fp8-astype":
            w = w_ref[0].astype(jnp.bfloat16)
            p = jax.lax.dot(x_ref[...], w,
                            preferred_element_type=jnp.float32)
            acc_ref[...] += p[:1, :]
        elif mode == "mixed":
            # bf16 x s8 directly: does Mosaic feed s8 into the MXU data
            # path without a separate VPU convert pass?
            p = jax.lax.dot(x_ref[...], w_ref[0],
                            preferred_element_type=jnp.float32)
            acc_ref[...] += p[:1, :]

        @pl.when(t == NT - 1)
        def _():
            o_ref[...] = acc_ref[...]

    return kern


def main():
    key = jax.random.key(0)
    w = jax.random.randint(key, (NT, BK, BN), -127, 128, jnp.int8)
    wf8 = jax.random.normal(key, (NT, BK, BN)).astype(jnp.float8_e4m3fn)
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, BK), jnp.bfloat16)
    xq = jax.random.randint(jax.random.fold_in(key, 2), (B, BK), -127, 128,
                            jnp.int8)

    import sys as _sys
    modes = (_sys.argv[1:] if len(_sys.argv) > 1
             else ["dma", "bf16", "int8", "fp8-bitdecode", "fp8-astype"])
    for mode in modes:
        f = pl.pallas_call(
            make_kernel(mode),
            grid=(NT,),
            in_specs=[
                pl.BlockSpec((B, BK), lambda t: (0, 0)),
                pl.BlockSpec((B, BK), lambda t: (0, 0)),
                pl.BlockSpec((1, BK, BN), lambda t: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, BN), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, BN), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, BN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )

        @jax.jit
        def chain(n, x, xq, w):
            def body(_, c):
                x, xq = c
                out = f(x, xq, w)
                d = (out[0, 0] * 1e-20)
                return (x + d.astype(x.dtype),
                        xq + d.astype(jnp.int32).astype(xq.dtype))

            x, xq = jax.lax.fori_loop(0, n, body, (x, xq))
            return x[0, 0].astype(jnp.float32)

        wm = wf8 if mode.startswith("fp8") else w
        float(chain(jnp.int32(2), x, xq, wm))

        def run(n):
            t0 = time.perf_counter()
            float(chain(jnp.int32(n), x, xq, w))
            return time.perf_counter() - t0

        def run(n, wm=wm):
            t0 = time.perf_counter()
            float(chain(jnp.int32(n), x, xq, wm))
            return time.perf_counter() - t0

        run(64)
        t1 = min(run(64) for _ in range(3))
        t2 = min(run(128) for _ in range(3))
        per = (t2 - t1) / 64
        gbs = w.nbytes / per / 1e9
        print(f"{mode:5s}: {per*1e6:7.1f} us / {NT} tiles "
              f"({per/NT*1e6:5.2f} us/tile, {gbs:6.1f} GB/s)")


if __name__ == "__main__":
    main()
