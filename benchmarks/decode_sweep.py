"""On-chip (bn, bk) sweep for the decode-shape dequant+matmul kernel.

Populates `mila_tpu.kernels.quant_matmul._DECODE_BLOCKS` (copy the printed
dict in). Compiles are the bottleneck on the tunneled chip (~4 min per new
kernel config), so this harness compiles ONE chain per config: a
`lax.fori_loop` with a *traced* trip count, timed at two lengths — the fixed
~30 ms host fetch RTT cancels in the delta, and the loop body compiles once
for any n.

Also measures the achievable HBM read bandwidth with a pure streaming kernel
(the denominator for roofline fractions in bench.py).

Usage: python benchmarks/decode_sweep.py [--batch 8] [--shapes wqkv,wo,...]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import benchmarks  # noqa: F401  - persistent compile cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Llama-3.2-1B fused decode shapes.
DECODE_SHAPES = {
    "wqkv": (2048, 3072),
    "wo": (2048, 2048),
    "wgu": (2048, 16384),
    "down": (8192, 2048),
    "lm_head": (2048, 129024),
}

# Candidate (bn, bk); bn*bk int8 <= ~6MB (double-buffers in ~16MB VMEM).
CONFIGS = {
    "wqkv": [(1024, 2048), (1536, 2048), (3072, 1024), (3072, 2048),
             (768, 2048), (512, 2048)],
    "wo": [(2048, 2048), (1024, 2048), (2048, 1024), (512, 2048),
           (1024, 1024)],
    "wgu": [(2048, 2048), (4096, 1024), (1024, 2048), (8192, 512),
            (512, 2048), (2048, 1024)],
    "down": [(2048, 2048), (1024, 2048), (512, 8192), (1024, 4096),
             (256, 8192), (2048, 4096)],
    "lm_head": [(2048, 2048), (1024, 2048), (3072, 2048), (512, 2048),
                (1536, 2048), (1024, 1024)],
}


def timed_loop(fn, x, *rest, reps=3, target_delta=0.06, max_n=65536):
    """Per-call time via dynamic-trip-count fori_loop delta (ONE compile).

    The tunneled chip has ~30 ms host-fetch jitter, so the iteration count
    auto-scales until the timed delta is >= ``target_delta`` seconds.
    """

    @jax.jit
    def chain(n, x, *rest):
        def body(_, x):
            out = fn(x, *rest)
            return x + (out.reshape(-1)[0] * 1e-20).astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, x, unroll=False)
        return x.reshape(-1)[0].astype(jnp.float32)

    float(chain(jnp.int32(2), x, *rest))  # compile + warm

    def best(n):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(jnp.int32(n), x, *rest))
            b = min(b, time.perf_counter() - t0)
        return b

    n0 = 64
    t0 = best(n0)
    n = 512
    while True:
        tn = best(n)
        if tn - t0 >= target_delta or n >= max_n:
            break
        n *= 4
    return max((tn - t0) / (n - n0), 1e-9)


# ---------------------------------------------------------------------------
# Peak HBM read bandwidth: stream a large int8 array through VMEM, minimal
# compute (sum one lane-row per tile into the output).
# ---------------------------------------------------------------------------

def _stream_kernel(x_ref, w_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # x in the kernel: the timing loop feeds the output back through x,
        # so the pallas_call is loop-carried and can't be hoisted by XLA.
        o_ref[...] = x_ref[...]

    o_ref[...] += jnp.sum(w_ref[...].astype(jnp.float32), axis=0, keepdims=True)


def hbm_read_bw(nbytes=512 * 1024 * 1024, block_rows=512, width=2048):
    rows = nbytes // width
    w = jnp.ones((rows, width), jnp.int8)

    def run(x, w):
        return pl.pallas_call(
            _stream_kernel,
            out_shape=jax.ShapeDtypeStruct((1, width), jnp.float32),
            grid=(rows // block_rows,),
            in_specs=[
                pl.BlockSpec((1, width), lambda i: (0, 0)),
                pl.BlockSpec((block_rows, width), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((1, width), lambda i: (0, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(x, w)

    t = timed_loop(run, jnp.zeros((1, width), jnp.float32), w, max_n=256)
    return nbytes / t


def sweep_shape(name, M, K, N, configs, peak_gbs):
    from mila_tpu.inference.quantize import quantize
    from mila_tpu.kernels.quant_matmul import quant_linear

    key = jax.random.key(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.normal(key, (K, N)) * 0.02
    qt = quantize(w, "int8")
    jax.block_until_ready((x, qt.q))
    w_bytes = K * N
    print(f"\n== {name}: M={M} K={K} N={N} ({w_bytes/1e6:.1f} MB int8) ==",
          flush=True)
    out = {}
    for bn, bk in configs:
        if N % bn or K % bk:
            continue
        t0 = time.time()
        try:
            t = timed_loop(
                functools.partial(quant_linear, block_n=bn, block_k=bk,
                                  interpret=False),
                x, qt,
            )
        except Exception as e:  # noqa: BLE001
            print(f"  bn{bn}_bk{bk}: ERR {type(e).__name__}: {e}", flush=True)
            continue
        gbs = w_bytes / t / 1e9
        out[(bn, bk)] = t
        print(f"  bn{bn}_bk{bk}: {t*1e6:8.1f} us  {gbs:6.0f} GB/s "
              f"({gbs/peak_gbs*100:4.1f}% of measured peak)"
              f"   [compile+meas {time.time()-t0:.0f}s]", flush=True)
    return out


def bench_fused(M, peak_gbs):
    """The whole-layer fused kernels (kernels/decode_fused.py) at the Llama
    1B decode shapes — what the model step actually calls."""
    from mila_tpu.inference.quantize import quantize
    from mila_tpu.kernels.decode_fused import (
        quant_linear_residual,
        rms_quant_linear,
        rms_quant_linear_swiglu,
    )

    key = jax.random.key(0)

    def data(K, N):
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, N)) * 0.02
        g = jnp.ones((K,), jnp.float32)
        return x, quantize(w, "int8"), g

    print(f"\n== fused decode kernels (M={M}) ==", flush=True)
    rows = []
    x, qt, g = data(2048, 3072)
    rows.append(("rms+wqkv", 2048 * 3072,
                 timed_loop(lambda x: rms_quant_linear(x, g, qt), x)))
    x, qt, g = data(2048, 2048)
    res = jax.random.normal(key, (M, 2048), jnp.bfloat16)
    rows.append(("wo+res", 2048 * 2048,
                 timed_loop(lambda x: quant_linear_residual(x, qt, res), x)))
    x, qt, g = data(2048, 16384)
    rows.append(("rms+wgu+swiglu", 2048 * 16384,
                 timed_loop(lambda x: rms_quant_linear_swiglu(x, g, qt), x)))
    x, qt, g = data(8192, 2048)
    res2 = jax.random.normal(key, (M, 2048), jnp.bfloat16)
    rows.append(("down+res", 8192 * 2048,
                 timed_loop(lambda x: quant_linear_residual(x, qt, res2), x)))
    x, qt, g = data(2048, 129024)
    rows.append(("rms+lm_head", 2048 * 129024,
                 timed_loop(lambda x: rms_quant_linear(x, g, qt), x)))
    total = 0.0
    for name, wb, t in rows:
        gbs = wb / t / 1e9
        total += t
        print(f"  {name:16s} {t*1e6:8.1f} us  {gbs:6.0f} GB/s "
              f"({gbs/peak_gbs*100:4.1f}% peak)", flush=True)
    head_t = rows[-1][2]
    step = 16 * (total - head_t) + head_t
    print(f"  matmul-only step estimate (16 layers + head): {step*1e3:.3f} ms",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--shapes", default=",".join(DECODE_SHAPES))
    ap.add_argument("--skip-bw", action="store_true")
    ap.add_argument("--fused", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices(), file=sys.stderr)

    peak = 819e9
    if not args.skip_bw:
        t0 = time.time()
        peak = hbm_read_bw()
        print(f"measured HBM read BW: {peak/1e9:.0f} GB/s "
              f"[{time.time()-t0:.0f}s]", flush=True)

    # Diagnostic: XLA bf16 matmul at the wgu shape — what a plain bf16
    # weight stream achieves without Pallas (2x the bytes, no dequant).
    if "wgu" in args.shapes:
        K, N = DECODE_SHAPES["wgu"]
        key = jax.random.key(0)
        x = jax.random.normal(key, (args.batch, K), jnp.bfloat16)
        wb = (jax.random.normal(key, (K, N)) * 0.02).astype(jnp.bfloat16)
        t = timed_loop(
            lambda x, w: jnp.matmul(x, w, preferred_element_type=jnp.float32
                                    ).astype(jnp.bfloat16),
            x, wb,
        )
        print(f"\nXLA bf16 matmul wgu: {t*1e6:.1f} us  "
              f"{K*N*2/t/1e9:.0f} GB/s wstream", flush=True)

    if args.fused:
        bench_fused(args.batch, peak / 1e9)

    best = {}
    for name in args.shapes.split(","):
        K, N = DECODE_SHAPES[name]
        res = sweep_shape(name, args.batch, K, N, CONFIGS[name], peak / 1e9)
        if res:
            (bn, bk), t = min(res.items(), key=lambda kv: kv[1])
            best[(K, N)] = (bn, bk)
            print(f"  -> best {name}: ({bn}, {bk})  {t*1e6:.1f} us", flush=True)

    print("\n_DECODE_BLOCKS = {", flush=True)
    for (K, N), (bn, bk) in best.items():
        print(f"    ({K}, {N}): ({bn}, {bk}),", flush=True)
    print("}", flush=True)
    print(json.dumps({"peak_hbm_gbs": peak / 1e9}), flush=True)


if __name__ == "__main__":
    main()
