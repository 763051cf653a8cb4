"""Kernel micro-benchmark harness (GBench analogue).

Parity: reference ``Mila/Benchmarks/GBench`` (linear/gelu/softmax forward
sweeps, theoretical-peak helper main.cpp:12-40). Measures Pallas kernels
against XLA baselines and the hardware roofline. Timing runs ``iters``
chained executions inside one jit to amortize host dispatch (the tunneled
TPU adds ~0.1ms per host call).
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

# v5e per-chip peaks (public spec): 197 bf16 TFLOP/s, 394 int8 TOP/s, ~819 GB/s HBM.
PEAK_BF16_TFLOPS = 197.0
PEAK_INT8_TOPS = 394.0
PEAK_HBM_GBS = 819.0


def timed_chain(fn, args, iters=50, warmup=2):
    """Marginal per-call wall time via delta timing.

    The tunneled TPU has a large fixed host↔device round-trip (~30 ms per
    result fetch) and `block_until_ready` does not actually wait for remote
    compute, so we (a) force a scalar fetch of a reduction over the output
    and (b) time chains of n and 4n data-dependent iterations, reporting
    (t_4n − t_n) / 3n — the fixed overhead cancels.
    """

    def make_chain(n):
        @jax.jit
        def chain(*args):
            def body(x, _):
                out = fn(x, *args[1:])
                # Data-dependence defeats CSE/overlap between iterations.
                x = x + (out.reshape(-1)[0] * 1e-20).astype(x.dtype)
                return x, out.reshape(-1)[0].astype(jnp.float32)

            _, outs = jax.lax.scan(body, args[0], None, length=n)
            return outs.sum()

        return chain

    # lax.scan keeps the compile small (body compiles once for any n).
    n1 = max(iters // 4, 2)
    n2 = n1 * 4
    c1, c2 = make_chain(n1), make_chain(n2)
    float(c1(*args))
    float(c2(*args))  # warm both compilations

    def best_of(chain, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(c1)
    t2 = best_of(c2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def bench_quant_matmul(M=256, K=2048, N=8192, iters=50):
    from mila_tpu.inference.quantize import quantize
    from mila_tpu.kernels.quant_matmul import quant_linear

    key = jax.random.key(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.normal(key, (K, N)) * 0.02
    qt = quantize(w, "int8")
    w_bf16 = w.astype(jnp.bfloat16)

    flops = 2 * M * K * N
    w_bytes = K * N  # int8 weight stream — the roofline term at small M
    results = {}

    t = timed_chain(lambda x: x @ w_bf16, (x,), iters)
    results["xla_bf16_matmul"] = t
    t = timed_chain(
        lambda x: jnp.matmul(
            x, (qt.q.astype(jnp.bfloat16) * qt.scale.astype(jnp.bfloat16)),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16),
        (x,), iters,
    )
    results["xla_dequant_matmul"] = t
    for bm, bn, bk in [(256, 256, 512), (256, 512, 512), (128, 512, 1024),
                       (256, 1024, 512), (256, 2048, 512)]:
        if bn > N or bk > K or bm > M:
            continue
        try:
            t = timed_chain(
                functools.partial(
                    lambda x, qt: quant_linear(
                        x, qt, block_m=bm, block_n=bn, block_k=bk, interpret=False
                    ),
                    qt=qt,
                ),
                (x,), iters,
            )
            results[f"pallas_qmm_{bm}x{bn}x{bk}"] = t
        except Exception as e:  # noqa: BLE001
            results[f"pallas_qmm_{bm}x{bn}x{bk}"] = f"ERROR {type(e).__name__}"

    print(f"\n== quant matmul M={M} K={K} N={N} ==")
    print(f"   roofline: compute {flops / PEAK_BF16_TFLOPS / 1e9:.1f} us (bf16) | "
          f"weight-stream {w_bytes / PEAK_HBM_GBS / 1e3:.1f} us")
    for name, t in results.items():
        if isinstance(t, str):
            print(f"   {name:28s} {t}")
        else:
            print(f"   {name:28s} {t * 1e6:8.1f} us  {flops / t / 1e12:6.1f} TFLOP/s  "
                  f"{w_bytes / t / 1e9:6.0f} GB/s-wstream")
    return results


def bench_flash_attention(B=4, T=2048, NH=8, D=128, iters=20):
    from mila_tpu.kernels.flash_attention import flash_attention
    from mila_tpu.ops import dot_product_attention

    key = jax.random.key(0)
    q = jax.random.normal(key, (B, T, NH, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, T, NH, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, T, NH, D), jnp.bfloat16)
    flops = 4 * B * NH * T * T * D // 2  # causal

    results = {}
    t = timed_chain(
        lambda q: dot_product_attention(q, k, v, causal=True), (q,), iters
    )
    results["xla_attention"] = t
    for bq, bk in [(128, 128), (256, 256), (512, 512), (256, 512), (512, 1024)]:
        if bq > T or bk > T:
            continue
        try:
            t = timed_chain(
                lambda q, _bq=bq, _bk=bk: flash_attention(
                    q, k, v, causal=True, block_q=_bq, block_k=_bk, interpret=False
                ),
                (q,), iters,
            )
            results[f"flash_{bq}x{bk}"] = t
        except Exception as e:  # noqa: BLE001
            results[f"flash_{bq}x{bk}"] = f"ERROR {type(e).__name__}: {e}"

    print(f"\n== flash attention B={B} T={T} NH={NH} D={D} (causal) ==")
    print(f"   roofline compute: {flops / PEAK_BF16_TFLOPS / 1e9:.1f} us")
    for name, t in results.items():
        if isinstance(t, str):
            print(f"   {name:28s} {t[:90]}")
        else:
            print(f"   {name:28s} {t * 1e6:8.1f} us  {flops / t / 1e12:6.1f} TFLOP/s")
    return results


def bench_op_forward_sweeps(iters=32):
    """GBench-parity sweeps: forward wall time for Linear/Gelu/Softmax over
    (B, T, C, OC) ranges (reference Benchmarks/GBench/{linear,gelu,softmax}
    _forward_fp32.cpp)."""
    from mila_tpu import ops

    key = jax.random.key(0)
    print("\n== op forward sweeps (bf16) ==")
    for B, T, C, OC in [(8, 128, 768, 3072), (8, 512, 768, 3072),
                        (4, 1024, 1024, 4096), (1, 2048, 2048, 8192)]:
        x = jax.random.normal(key, (B * T, C), jnp.bfloat16)
        w = jax.random.normal(key, (C, OC), jnp.bfloat16)
        b = jnp.zeros((OC,), jnp.bfloat16)
        t = timed_chain(lambda x: ops.linear(x, w, b), (x,), iters)
        fl = 2 * B * T * C * OC
        print(f"   linear  B{B} T{T} C{C}->OC{OC}: {t * 1e6:8.1f} us  "
              f"{fl / t / 1e12:6.1f} TFLOP/s")
    for n in (1 << 20, 1 << 24):
        x = jax.random.normal(key, (n // 128, 128), jnp.bfloat16)
        t = timed_chain(lambda x: ops.gelu(x), (x,), iters)
        print(f"   gelu    n={n}: {t * 1e6:8.1f} us  {2 * x.nbytes / t / 1e9:6.0f} GB/s")
        t = timed_chain(lambda x: ops.softmax(x), (x,), iters)
        print(f"   softmax n={n}: {t * 1e6:8.1f} us  {2 * x.nbytes / t / 1e9:6.0f} GB/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="all", choices=["all", "qmm", "flash", "ops"])
    a = ap.parse_args()
    import mila_tpu

    mila_tpu.initialize(0)
    print("devices:", jax.devices())
    if a.what in ("all", "qmm"):
        bench_quant_matmul()
    if a.what in ("all", "flash"):
        bench_flash_attention()
    if a.what in ("all", "ops"):
        bench_op_forward_sweeps()
