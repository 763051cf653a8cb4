"""Benchmark harness — prints ONE JSON line for the driver.

Headline (BASELINE.json metric): Llama-3.2-1B INT8 weight-only decode
tokens/sec/chip + p50 TTFT, with vs_baseline = speedup over our own BF16
decode on the same chip (the reference has no comparable LLM-serving number;
its only published figure is MNIST training throughput, available via
``--what mnist``).

Usage: python bench.py [--what auto|llama|mnist]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
# Persistent compile cache: remote TPU compiles are slow; make driver reruns
# fast. Lives in the repo (/tmp is wiped between rounds).
import benchmarks  # noqa: F401  - sets JAX_COMPILATION_CACHE_DIR

MNIST_REF_SAMPLES_PER_SEC = 136_000.0  # reference README.md:66


def bench_mnist_training() -> dict:
    import jax
    import jax.numpy as jnp

    import mila_tpu
    from mila_tpu.data import synthetic_mnist
    from mila_tpu.models import MLPClassifier, MLPClassifierConfig
    from mila_tpu.optim import AdamW, AdamWConfig
    from mila_tpu.ops import softmax_cross_entropy

    mila_tpu.initialize(seed=0)
    batch = 2048
    n = 65536
    x_np, y_np = synthetic_mnist(n=n, seed=0)
    x = jnp.asarray(x_np)
    y = jnp.asarray(y_np)

    module = MLPClassifier(MLPClassifierConfig(name="bench-mnist"))
    params = module.init(jax.random.key(0), (batch, 784))
    opt = AdamW(AdamWConfig(learning_rate=1e-3))
    opt_state = opt.init(params)

    steps_per_epoch = n // batch

    def loss_fn(p, xb, yb):
        return softmax_cross_entropy(module.apply(p, xb), yb).mean()

    @jax.jit
    def epoch(params, opt_state, x, y):
        def body(carry, i):
            params, opt_state = carry
            xb = jax.lax.dynamic_slice_in_dim(x, i * batch, batch)
            yb = jax.lax.dynamic_slice_in_dim(y, i * batch, batch)
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
            params, opt_state = opt.step(opt_state, params, grads)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps_per_epoch)
        )
        return params, opt_state, losses.mean()

    # Warmup (compile) + one timed check that loss decreases. The tunneled
    # TPU has a large fixed result-fetch overhead and an unreliable
    # block_until_ready, so timing = delta between n and 4n epoch chains with
    # a forced scalar fetch (fixed cost cancels).
    params, opt_state, l0 = epoch(params, opt_state, x, y)
    l0 = float(l0)

    def run_epochs(n):
        t0 = time.perf_counter()
        p, s = params, opt_state
        loss = None
        for _ in range(n):
            p, s, loss = epoch(p, s, x, y)
        lv = float(loss)
        return time.perf_counter() - t0, lv

    n1 = 3
    run_epochs(n1)  # warm
    t1 = min(run_epochs(n1)[0] for _ in range(2))
    t2, loss_final = run_epochs(n1 * 4)
    t2 = min(t2, run_epochs(n1 * 4)[0])
    dt_per_epoch = max((t2 - t1) / (n1 * 3), 1e-9)
    sps = steps_per_epoch * batch / dt_per_epoch
    loss = loss_final
    assert float(loss) < float(l0), "training must make progress during bench"
    return {
        "metric": "mnist_mlp_train_throughput",
        "value": round(sps, 1),
        "unit": "samples/sec",
        "vs_baseline": round(sps / MNIST_REF_SAMPLES_PER_SEC, 3),
    }


def bench_llama_decode(dtypes=("int8", "bf16", "fp8", "int4")) -> dict:
    from benchmarks.llama_bench import bench_decode, build_model

    import mila_tpu
    from mila_tpu.inference.quantize import quantize_model_params
    from mila_tpu.models.llama import (
        add_quantized_lm_head,
        fuse_llama_projections,
        pack_decode_giga,
        pack_decode_layers,
    )

    mila_tpu.initialize(0)
    model, params, cfg = build_model("1b", "bfloat16")
    # Decode-path weight-stream optimizations (numerics covered by
    # tests/models/test_llama.py::test_fused_* and tests/kernels/
    # test_decode_fused.py): fuse wqkv/wgu so 7 weight streams per block
    # become 4, and give the tied lm_head a quantized copy.
    params = fuse_llama_projections(params)
    detail = {"batch": 8, "prompt_len": 128,
              "note": "vs_baseline = roofline_frac: measured per-token time "
                      "vs the mandatory-HBM-bytes lower bound at 819 GB/s"}
    for dt in dtypes:
        try:
            if dt == "bf16":
                # bf16 stays on the per-layer decode path: the giga stream
                # with 2MB bf16 tiles measured 10.1 ms/step vs 4.1 here
                # (Mosaic won't pipeline multi-MB tile groups; see
                # models/llama.py pack_decode_giga).
                detail["bf16"] = bench_decode(model, params, cfg, batch=8,
                                              prompt_len=128)
            else:
                qdt = "fp8_e4m3" if dt == "fp8" else dt
                qparams = pack_decode_layers(add_quantized_lm_head(
                    quantize_model_params(params, qdt), qdt
                ))
                # Whole-model single-kernel decode stream (falls through to
                # the layer_stream two-kernel path when it doesn't pack).
                qparams = pack_decode_giga(qparams, cfg)
                detail[dt] = bench_decode(model, qparams, cfg, batch=8,
                                          prompt_len=128)
        except Exception as e:  # noqa: BLE001 - report per-dtype failures
            if dt == "int8":
                raise  # the headline metric must not be silently absent
            traceback.print_exc()
            detail[dt] = {"error": f"{type(e).__name__}: {e}"[:300]}
    pick = detail.get("int8") or detail.get("fp8") or detail["bf16"]
    return {
        "metric": "llama32_1b_int8_decode_tok_s_chip",
        "value": pick["decode_tok_s_total"],
        "unit": "tokens/sec/chip",
        "vs_baseline": pick["roofline_frac"],
        "detail": detail,
    }


def bench_gpt2_decode() -> dict:
    from benchmarks.llama_bench import bench_decode, build_model

    import mila_tpu

    mila_tpu.initialize(0)
    model, params, cfg = build_model("gpt2-124m", "bfloat16")
    r = bench_decode(model, params, cfg, batch=8, prompt_len=128)
    return {
        "metric": "gpt2_124m_bf16_decode_tok_s_chip",
        "value": r["decode_tok_s_total"],
        "unit": "tokens/sec/chip",
        "vs_baseline": r["roofline_frac"],
        "detail": r,
    }


def bench_flash_prefill() -> dict:
    """Flash-attention forward at prefill shape vs the matmul-peak bound."""
    import jax
    import jax.numpy as jnp

    from benchmarks.decode_sweep import timed_loop
    from mila_tpu.kernels.flash_attention import flash_attention
    from mila_tpu.ops import dot_product_attention

    B, T, NH, NKV, HD = 4, 2048, 32, 8, 64
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, T, NH, HD), jnp.bfloat16)
    k = jax.random.normal(key, (B, T, NKV, HD), jnp.bfloat16)
    v = jax.random.normal(key, (B, T, NKV, HD), jnp.bfloat16)
    t_flash = timed_loop(
        lambda q: flash_attention(q, k, v, causal=True, interpret=False), q
    )
    t_xla = timed_loop(lambda q: dot_product_attention(q, k, v, causal=True), q)
    flops = 2 * 2 * B * NH * HD * T * T / 2  # qk + av, causal half
    tf = flops / t_flash / 1e12
    return {
        "metric": "flash_attention_prefill_tflops",
        "value": round(tf, 1),
        "unit": "TFLOP/s",
        "vs_baseline": round(tf / 197.0, 3),  # fraction of bf16 matmul peak
        "detail": {"t_flash_us": round(t_flash * 1e6, 1),
                   "t_xla_us": round(t_xla * 1e6, 1),
                   "speedup_vs_xla": round(t_xla / t_flash, 2),
                   "shape": [B, T, NH, NKV, HD]},
    }


def bench_paged_decode() -> dict:
    """Paged decode attention kernel step time at engine shapes."""
    import jax
    import jax.numpy as jnp

    from benchmarks.decode_sweep import timed_loop
    from mila_tpu.kernels.paged_attention import paged_decode_attention

    B, NKV, NH, HD, ps, pages_per = 8, 8, 32, 64, 128, 16
    npages = B * pages_per + 1
    key = jax.random.key(0)
    # Page-major layout [P, NKV, HD, ps] — what the engine's page pools
    # allocate (inference/kv_cache.py) and the kernel expects.
    kp = jax.random.normal(key, (npages, NKV, HD, ps), jnp.bfloat16)
    vp = jax.random.normal(key, (npages, NKV, HD, ps), jnp.bfloat16)
    table = (1 + jnp.arange(B * pages_per, dtype=jnp.int32)).reshape(B, pages_per)
    lens = jnp.full((B,), ps * pages_per, jnp.int32)
    q = jax.random.normal(key, (B, 1, NH, HD), jnp.bfloat16)
    t = timed_loop(
        lambda q: paged_decode_attention(q, kp, vp, table, lens,
                                         interpret=False), q
    )
    kv_bytes = 2 * B * ps * pages_per * NKV * HD * 2
    gbs = kv_bytes / t / 1e9
    return {
        "metric": "paged_decode_attention_us",
        "value": round(t * 1e6, 1),
        "unit": "us/step",
        "vs_baseline": round(gbs / 819.0, 3),
        "detail": {"kv_stream_gbs": round(gbs, 1), "batch": B,
                   "context": ps * pages_per},
    }


def kernel_check() -> dict:
    """On-chip Pallas-vs-oracle equivalence (VERDICT item 5): every kernel
    family runs compiled (interpret=False) on the real chip each round."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mila_tpu.inference.quantize import quant_linear_ref, quantize
    from mila_tpu.kernels.decode_fused import (
        quant_linear_residual,
        rms_quant_linear,
        rms_quant_linear_swiglu,
    )
    from mila_tpu.kernels.flash_attention import flash_attention
    from mila_tpu.kernels.fused_adamw import fused_adamw_update
    from mila_tpu.kernels.paged_attention import paged_decode_attention
    from mila_tpu.kernels.quant_matmul import quant_linear
    from mila_tpu.kernels.softmax_ce import fused_softmax_cross_entropy
    from mila_tpu.ops import dot_product_attention, softmax_cross_entropy
    from mila_tpu.ops.rmsnorm import rms_norm
    from mila_tpu.ops.swiglu import swiglu

    key = jax.random.key(0)
    results = {}

    def check(name, got, want, rtol=3e-2, atol=3e-2):
        got = np.asarray(got, np.float32)
        want = np.asarray(want, np.float32)
        ok = np.allclose(got, want, rtol=rtol, atol=atol)
        err = float(np.max(np.abs(got - want))) if got.size else 0.0
        results[name] = {"pass": bool(ok), "max_abs_err": round(err, 5)}

    def section(name, fn):
        # Fault isolation: one broken kernel must not erase the whole
        # report (round-3 failure mode — VERDICT r3 weak #3).
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            results[name] = {"pass": False,
                             "error": f"{type(e).__name__}: {e}"[:200]}

    # Shared inputs (pure jnp, cannot fail).
    x = jax.random.normal(key, (8, 512), jnp.bfloat16)
    w = jax.random.normal(key, (512, 1024)) * 0.02
    qt = quantize(w, "int8")
    H, I = 2048, 8192
    att = jax.random.normal(key, (8, H), jnp.bfloat16)
    xres = jax.random.normal(jax.random.fold_in(key, 11), (8, H), jnp.bfloat16)
    gm = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 12), (H,))
    wo_q = quantize(jax.random.normal(key, (H, H)) * 0.02, "int8")
    wgu_q = quantize(jax.random.normal(key, (H, 2 * I)) * 0.02, "int8")
    down_q = quantize(jax.random.normal(key, (I, H)) * 0.02, "int8")

    def sec_quant_matmul():
        check("quant_matmul_int8", quant_linear(x, qt, interpret=False),
              quant_linear_ref(x, qt))
        qt8 = quantize(w, "fp8_e4m3")
        check("quant_matmul_fp8", quant_linear(x, qt8, interpret=False),
              quant_linear_ref(x, qt8))

    def sec_quant_matmul_lm_head():
        # fp8 at the largest decode tile: guards VMEM regressions in the
        # Mosaic bit-decode fusion that CPU interpret mode can't see.
        xl = jax.random.normal(key, (8, 2048), jnp.bfloat16)
        wl = jax.random.normal(key, (2048, 129024)) * 0.02
        qtl = quantize(wl, "fp8_e4m3")
        check("quant_matmul_fp8_lm_head_tile",
              quant_linear(xl, qtl, interpret=False)[:, ::1031],
              quant_linear_ref(xl, qtl)[:, ::1031])

    def sec_mlp_megakernel():
        from mila_tpu.kernels.decode_mlp import (
            mlp_block_fused, mlp_block_ref, pack_mlp,
        )

        mp = pack_mlp(wo_q, wgu_q, down_q)
        check("mlp_megakernel",
              mlp_block_fused(att, xres, gm, mp, interpret=False),
              mlp_block_ref(att, xres, gm, wo_q, wgu_q, down_q),
              rtol=6e-2, atol=6e-2)

    def sec_dense_attention():
        from mila_tpu.kernels.dense_attention import dense_decode_attention
        from mila_tpu.ops.attention import decode_attention as dec_ref

        Bq, NKVq, NHq, Tq, HDq = 4, 4, 16, 256, 64
        qd2 = jax.random.normal(key, (Bq, 1, NHq, HDq), jnp.bfloat16)
        kc = jax.random.normal(jax.random.fold_in(key, 13),
                               (Bq, Tq, NKVq, HDq), jnp.bfloat16)
        vc = jax.random.normal(jax.random.fold_in(key, 14),
                               (Bq, Tq, NKVq, HDq), jnp.bfloat16)
        lens2 = jnp.array([5, 128, 200, 256], jnp.int32)
        check("dense_decode_attention",
              dense_decode_attention(qd2, kc, vc, lens2, interpret=False),
              dec_ref(qd2.astype(jnp.float32), kc.astype(jnp.float32),
                      vc.astype(jnp.float32), lens2),
              rtol=2e-2, atol=2e-2)

    def sec_fused_attention():
        # fused_decode_attention (in-kernel RoPE + current-token fold) vs
        # its jnp oracle (advisor r3 finding #2: the default decode path
        # had no on-chip numerics coverage). Table construction mirrors
        # models/llama.py:_backbone_fused_decode.
        from mila_tpu.kernels.dense_attention import (
            fused_decode_attention, pack_queries,
        )

        Bq, NKVq, NHq, Tq, HDq = 4, 4, 16, 256, 64
        KD, NQ = NKVq * HDq, NHq * HDq
        qkv = jax.random.normal(jax.random.fold_in(key, 20),
                                (Bq, NQ + 2 * KD), jnp.bfloat16)
        kc = jax.random.normal(jax.random.fold_in(key, 23),
                               (Bq, Tq, NKVq, HDq), jnp.bfloat16)
        vc = jax.random.normal(jax.random.fold_in(key, 24),
                               (Bq, Tq, NKVq, HDq), jnp.bfloat16)
        old_lens = jnp.array([5, 128, 200, 255], jnp.int32)
        d2 = HDq // 2
        inv = 1.0 / (10000.0 ** (jnp.arange(d2, dtype=jnp.float32) / d2))
        ang = old_lens[:, None].astype(jnp.float32) * inv[None]
        c2, s2 = jnp.cos(ang), jnp.sin(ang)
        cos_t = jnp.tile(jnp.concatenate([c2, c2], -1), (1, NKVq))
        sin_t = jnp.tile(jnp.concatenate([-s2, s2], -1), (1, NKVq))
        q_pk = pack_queries(qkv[:, :NQ].reshape(Bq, NHq, HDq), NKVq)
        got_att, got_kn, got_kc, got_vc = fused_decode_attention(
            qkv, q_pk, cos_t, sin_t, kc, vc, old_lens,
            num_heads=NHq, interpret=False)
        want_att, want_kn, want_kc, want_vc = fused_decode_attention(
            qkv, q_pk, cos_t, sin_t, kc, vc, old_lens,
            num_heads=NHq, interpret=True)
        check("fused_decode_attention", got_att, want_att,
              rtol=2e-2, atol=2e-2)
        check("fused_decode_attention_knew", got_kn, want_kn,
              rtol=2e-2, atol=2e-2)
        check("fused_decode_attention_cache_wb", got_kc, want_kc,
              rtol=2e-2, atol=2e-2)
        check("fused_decode_attention_cache_wb_v", got_vc, want_vc,
              rtol=2e-2, atol=2e-2)

    def sec_layer_tail():
        from mila_tpu.kernels.layer_fused import mlp_qkv_fused, pack_layer

        wqkv_q = quantize(jax.random.normal(key, (2048, 3072)) * 0.02, "int8")
        lp = pack_layer(wo_q, wgu_q, down_q, wqkv_q, bn=512)
        xo_f, qkv_f = mlp_qkv_fused(att, xres, gm, lp, gm, interpret=False)
        xo_r, qkv_r = mlp_qkv_fused(att, xres, gm, lp, gm, interpret=True)
        check("layer_tail_megakernel", xo_f, xo_r, rtol=6e-2, atol=6e-2)
        check("layer_tail_qkv", qkv_f, qkv_r, rtol=8e-2, atol=8e-2)

    def sec_argmax_head():
        from mila_tpu.kernels.decode_fused import rms_quant_linear_argmax

        wv = jax.random.normal(key, (512, 4096)) * 0.05
        qtv = quantize(wv, "int8")
        gmv = jnp.ones((512,), jnp.float32)
        tok = rms_quant_linear_argmax(x, gmv, qtv, vocab_size=4000,
                                      interpret=False)
        logits_ref = quant_linear_ref(
            rms_norm(x, gmv, 1e-5), qtv, compute_dtype=jnp.float32
        ).astype(jnp.float32)[:, :4000]
        check("rms_quant_linear_argmax", tok[:, 0].astype(jnp.float32),
              jnp.argmax(logits_ref, -1).astype(jnp.float32), rtol=0, atol=0.5)

    def sec_decode_fused():
        gamma = 1.0 + 0.1 * jax.random.normal(key, (512,), jnp.float32)
        check("rms_quant_linear",
              rms_quant_linear(x, gamma, qt, eps=1e-5, interpret=False),
              quant_linear_ref(rms_norm(x, gamma, 1e-5), qt))
        res = jax.random.normal(key, (8, 1024), jnp.bfloat16)
        check("quant_linear_residual",
              quant_linear_residual(x, qt, res, interpret=False),
              quant_linear_ref(x, qt).astype(jnp.float32)
              + res.astype(jnp.float32),
              rtol=4e-2, atol=4e-2)
        g, u = jnp.split(quant_linear_ref(rms_norm(x, gamma, 1e-5), qt), 2, -1)
        check("rms_quant_linear_swiglu",
              rms_quant_linear_swiglu(x, gamma, qt, eps=1e-5, interpret=False),
              swiglu(g, u), rtol=5e-2, atol=5e-2)

    def sec_flash():
        q = jax.random.normal(key, (1, 256, 4, 128), jnp.float32)
        k = jax.random.normal(jax.random.fold_in(key, 1), (1, 256, 2, 128))
        v = jax.random.normal(jax.random.fold_in(key, 2), (1, 256, 2, 128))
        check("flash_attention",
              flash_attention(q, k, v, causal=True, interpret=False),
              dot_product_attention(q, k, v, causal=True),
              rtol=5e-3, atol=5e-3)

    def sec_paged():
        # Page-major layout [P, NKV, HD, ps] — the engine's layout
        # (inference/kv_cache.py), bf16 and int8-KV variants.
        B, NKV, NH, HD, ps, W = 4, 2, 4, 64, 128, 4
        kp = jax.random.normal(key, (B * W + 1, NKV, HD, ps), jnp.bfloat16)
        vp = jax.random.normal(jax.random.fold_in(key, 3),
                               (B * W + 1, NKV, HD, ps), jnp.bfloat16)
        table = (1 + jnp.arange(B * W, dtype=jnp.int32)).reshape(B, W)
        lens = jnp.array([ps * W, ps * 2 + 7, 1, ps], jnp.int32)
        qd = jax.random.normal(key, (B, 1, NH, HD), jnp.bfloat16)
        got = paged_decode_attention(qd, kp, vp, table, lens, interpret=False)
        want = paged_decode_attention(qd, kp, vp, table, lens, interpret=True)
        check("paged_decode_attention", got, want, rtol=2e-2, atol=2e-2)

    def sec_paged_int8():
        B, NKV, NH, HD, ps, W = 4, 2, 4, 64, 128, 4
        kq = jax.random.randint(key, (B * W + 1, NKV, HD, ps), -127, 128,
                                jnp.int8)
        vq = jax.random.randint(jax.random.fold_in(key, 3),
                                (B * W + 1, NKV, HD, ps), -127, 128, jnp.int8)
        ks = jax.random.uniform(jax.random.fold_in(key, 6),
                                (B * W + 1, NKV, ps), jnp.float32, 0.005, 0.02)
        vs = jax.random.uniform(jax.random.fold_in(key, 7),
                                (B * W + 1, NKV, ps), jnp.float32, 0.005, 0.02)
        table = (1 + jnp.arange(B * W, dtype=jnp.int32)).reshape(B, W)
        lens = jnp.array([ps * W, ps * 2 + 7, 1, ps], jnp.int32)
        qd = jax.random.normal(key, (B, 1, NH, HD), jnp.bfloat16)
        got = paged_decode_attention(qd, kq, vq, table, lens, k_scale=ks,
                                     v_scale=vs, interpret=False)
        want = paged_decode_attention(qd, kq, vq, table, lens, k_scale=ks,
                                      v_scale=vs, interpret=True)
        check("paged_decode_attention_int8kv", got, want, rtol=2e-2, atol=2e-2)

    def sec_adamw():
        p = jax.random.normal(key, (256, 512), jnp.float32)
        gr = jax.random.normal(jax.random.fold_in(key, 4), (256, 512),
                               jnp.float32)
        m = jnp.zeros_like(p)
        vv = jnp.zeros_like(p)
        kw = dict(step=jnp.int32(1), lr=1e-3, beta1=0.9, beta2=0.999,
                  eps=1e-8, weight_decay=0.01)
        got = fused_adamw_update(p, gr, m, vv, None, interpret=False, **kw)
        want = fused_adamw_update(p, gr, m, vv, None, interpret=True, **kw)
        for i, nm in enumerate(("p", "m", "v")):
            check(f"fused_adamw_{nm}", got[i], want[i], rtol=1e-5, atol=1e-6)

    def sec_softmax_ce():
        logits = jax.random.normal(key, (64, 2048), jnp.float32)
        targets = jax.random.randint(jax.random.fold_in(key, 5), (64,), 0,
                                     2048)
        check("softmax_ce",
              fused_softmax_cross_entropy(logits, targets, interpret=False),
              softmax_cross_entropy(logits, targets), rtol=1e-4, atol=1e-4)

    def sec_mega_layer():
        # Single-kernel decode layer (kernels/layer_mega.py) vs its jnp
        # oracle at reduced shapes (same code paths: slot unpack, in-kernel
        # attention, RMW write-back, weight stream, next-layer qkv).
        from mila_tpu.kernels.layer_mega import (
            layer_megakernel, pack_mega_layer,
        )

        Bm, NKVm, NHm, HDm, Tm = 4, 2, 8, 64, 256
        Hm, Im = 512, 1024
        KDm, NQm = NKVm * HDm, NHm * HDm
        km = jax.random.fold_in(key, 40)
        wo_m = quantize(jax.random.normal(km, (NQm, Hm)) * 0.05, "int8")
        wgu_m = quantize(
            jax.random.normal(jax.random.fold_in(km, 1), (Hm, 2 * Im)) * 0.05,
            "int8")
        down_m = quantize(
            jax.random.normal(jax.random.fold_in(km, 2), (Im, Hm)) * 0.05,
            "int8")
        wqkv_m = quantize(
            jax.random.normal(jax.random.fold_in(km, 3),
                              (Hm, NQm + 2 * KDm)) * 0.05, "int8")
        mp = pack_mega_layer(wo_m, wgu_m, down_m, wqkv_m, nh=NHm, nkv=NKVm,
                             hd=HDm, bn=128)
        assert mp is not None
        qkv = jax.random.normal(jax.random.fold_in(km, 4),
                                (Bm, NQm + 2 * KDm), jnp.bfloat16)
        xm = jax.random.normal(jax.random.fold_in(km, 5), (Bm, Hm),
                               jnp.bfloat16)
        kc = jax.random.normal(jax.random.fold_in(km, 6),
                               (Bm, Tm, NKVm, HDm), jnp.bfloat16)
        vc = jax.random.normal(jax.random.fold_in(km, 7),
                               (Bm, Tm, NKVm, HDm), jnp.bfloat16)
        lens_m = jnp.array([5, 77, 130, 200], jnp.int32)
        d2 = HDm // 2
        inv = 1.0 / (10000.0 ** (jnp.arange(d2, dtype=jnp.float32) / d2))
        ang = lens_m[:, None].astype(jnp.float32) * inv[None]
        c2m, s2m = jnp.cos(ang), jnp.sin(ang)
        cos_t = jnp.tile(jnp.concatenate([c2m, c2m], -1), (1, NKVm))
        sin_t = jnp.tile(jnp.concatenate([-s2m, s2m], -1), (1, NKVm))
        gm_m = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(km, 8), (Hm,))
        got = layer_megakernel(qkv, xm, gm_m, mp, kc, vc, lens_m, cos_t,
                               sin_t, gm_m, num_heads=NHm, interpret=False)
        want = layer_megakernel(qkv, xm, gm_m, mp, kc, vc, lens_m, cos_t,
                                sin_t, gm_m, num_heads=NHm, interpret=True)
        for nm, g, w in zip(("x_out", "qkv_next", "kc", "vc"), got, want):
            check(f"mega_layer_{nm}", g, w, rtol=4e-2, atol=4e-2)

    def sec_giga():
        # Whole-model giga decode kernel at PRODUCTION per-layer shapes
        # (full H=2048/I=8192/NH=32 — the VMEM-risk dimensions; L=2 and a
        # head slice keep the oracle cheap; bench_llama_decode runs the
        # true 16-layer + 129k-head compile every round anyway).
        from benchmarks.r5_giga import build as build_giga
        from mila_tpu.kernels.decode_giga import giga_decode_step

        dims = dict(L=2, H=2048, I=8192, NH=32, NKV=8, HD=64, VPAD=4096,
                    vocab=4000)
        pack = build_giga("int8", **dims)
        Bg, Tg, NKVg, HDg = 8, 512, 8, 64
        KDg = NKVg * HDg
        kg = jax.random.fold_in(key, 77)
        xg = jax.random.normal(kg, (Bg, 2048), jnp.bfloat16)
        lens_g = jnp.array([0, 8, 63, 64, 128, 200, 500, 511], jnp.int32)
        d2 = HDg // 2
        inv = 1.0 / (500000.0 ** (jnp.arange(d2, dtype=jnp.float32) / d2))
        ang = lens_g[:, None].astype(jnp.float32) * inv[None]
        c2g, s2g = jnp.cos(ang), jnp.sin(ang)
        cos_g = jnp.tile(jnp.concatenate([c2g, c2g], -1), (1, NKVg))
        sin_g = jnp.tile(jnp.concatenate([-s2g, s2g], -1), (1, NKVg))
        kp = jax.random.normal(jax.random.fold_in(kg, 1),
                               (2, Bg, Tg, KDg), jnp.bfloat16)
        vp = jax.random.normal(jax.random.fold_in(kg, 2),
                               (2, Bg, Tg, KDg), jnp.bfloat16)
        got = giga_decode_step(xg, cos_g, sin_g, lens_g, pack, kp, vp,
                               interpret=False)
        want = giga_decode_step(xg, cos_g, sin_g, lens_g, pack, kp, vp,
                                interpret=True)
        for nm, g, wv in zip(("logits", "kc", "vc"),
                             (got[1], got[2], got[3]),
                             (want[1], want[2], want[3])):
            check(f"giga_{nm}", g, wv, rtol=5e-2, atol=5e-2)
        # greedy tokens: near-ties on random weights may flip; require 7/8
        agree = float((got[0] == want[0]).sum())
        results["giga_token_agreement"] = {
            "pass": bool(agree >= 7), "max_abs_err": 8 - agree}
        # token-mode entry (in-kernel embed + rope): the production path
        wte = jax.random.normal(jax.random.fold_in(kg, 9), (4096, 2048),
                                jnp.bfloat16) * 0.02
        toks = jnp.array([1, 7, 8, 4095, 100, 2048, 33, 500], jnp.int32)
        got_t = giga_decode_step(wte, None, None, lens_g, pack, kp, vp,
                                 tokens=toks, interpret=False)
        want_t = giga_decode_step(wte, None, None, lens_g, pack, kp, vp,
                                  tokens=toks, interpret=True)
        check("giga_tokens_logits", got_t[1], want_t[1], rtol=5e-2,
              atol=5e-2)
        check("giga_tokens_kc", got_t[2], want_t[2], rtol=5e-2, atol=5e-2)

    for name, fn in (
        ("quant_matmul", sec_quant_matmul),
        ("giga", sec_giga),
        ("mega_layer", sec_mega_layer),
        ("quant_matmul_lm_head", sec_quant_matmul_lm_head),
        ("mlp_megakernel", sec_mlp_megakernel),
        ("dense_decode_attention", sec_dense_attention),
        ("fused_decode_attention", sec_fused_attention),
        ("layer_tail", sec_layer_tail),
        ("argmax_head", sec_argmax_head),
        ("decode_fused", sec_decode_fused),
        ("flash_attention", sec_flash),
        ("paged_decode_attention", sec_paged),
        ("paged_decode_attention_int8kv", sec_paged_int8),
        ("fused_adamw", sec_adamw),
        ("softmax_ce", sec_softmax_ce),
    ):
        section(name, fn)

    n_pass = sum(1 for r in results.values() if r["pass"])
    return {
        "metric": "kernel_check_on_chip",
        "value": n_pass,
        "unit": f"of {len(results)} kernels exact-vs-oracle",
        "vs_baseline": round(n_pass / max(len(results), 1), 3),
        "detail": results,
    }


def _current_round() -> int:
    import glob
    import re

    ns = [int(re.search(r"BENCH_r0*(\d+)", p).group(1))
          for p in glob.glob(str(Path(__file__).parent / "BENCH_r*.json"))]
    return (max(ns) + 1) if ns else 1


def check_status_header() -> dict:
    """docs/STATUS.md must carry a `round: N` header for the CURRENT round
    — a stale STATUS fails preflight (VERDICT r5 item 4: fifth round the
    rewrite was demanded; now structurally enforced)."""
    import re

    cur = _current_round()
    status = Path(__file__).parent / "docs" / "STATUS.md"
    text = status.read_text() if status.exists() else ""
    m = re.search(r"^round:\s*(\d+)", text, re.M)
    ok = bool(m) and int(m.group(1)) == cur
    return {"pass": ok, "expected_round": cur,
            "found": int(m.group(1)) if m else None}


def check_dtype_regression(result: dict) -> dict:
    """Per-dtype roofline comparison against the previous round's recorded
    BENCH json: a silent >10% drop (or a new error row) fails preflight
    (VERDICT r5 item 4 — the r4 fp8 0.586->0.39 collapse shipped unnoticed
    because nothing diffed the rounds)."""
    import glob
    import re

    files = sorted(
        glob.glob(str(Path(__file__).parent / "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r0*(\d+)", p).group(1)),
    )
    if not files:
        return {"pass": True, "note": "no previous round"}
    prev = json.loads(Path(files[-1]).read_text())
    prev_detail = (prev.get("parsed") or {}).get("detail") or {}
    checks = {}
    ok = True
    for dt in ("int8", "bf16", "fp8", "int4"):
        p = prev_detail.get(dt) or {}
        c = result.get("detail", {}).get(dt) or {}
        pv = p.get("roofline_frac")
        cv = c.get("roofline_frac")
        if cv is None:
            # current row errored: only acceptable if it errored before too
            row_ok = pv is None
            checks[dt] = {"pass": row_ok, "prev": pv,
                          "cur": c.get("error", "missing")[:120]}
        elif pv is None:
            checks[dt] = {"pass": True, "prev": None, "cur": cv}
        else:
            row_ok = cv >= 0.9 * pv
            checks[dt] = {"pass": row_ok, "prev": pv, "cur": cv}
        ok = ok and checks[dt]["pass"]
    return {"pass": ok, **checks}


def preflight() -> dict:
    """Round-end guard (VERDICT r3 item 9 / r5 item 4): on-chip kernel
    equivalence, a short REAL decode smoke, the full per-dtype llama bench
    diffed against the PREVIOUS round's recorded json (>10% roofline drop
    or a new error row fails), and a STATUS.md round-header freshness
    check. Run before any perf-path commit is considered done; exits
    nonzero on any failure."""
    import jax
    import jax.numpy as jnp

    import mila_tpu
    from mila_tpu.inference.quantize import quantize_model_params
    from mila_tpu.models.llama import (
        Llama, LlamaConfig, add_quantized_lm_head, fuse_llama_projections,
        pack_decode_layers,
    )

    mila_tpu.initialize(0)
    kc = kernel_check()
    ok = kc["value"] == int(kc["unit"].split()[1])

    cfg = LlamaConfig.llama32_1b().replace(
        max_seq_len=256, num_layers=2, param_dtype="bfloat16"
    )
    model = Llama(cfg)
    params = model.init(jax.random.key(0), (1, 16))
    qparams = pack_decode_layers(add_quantized_lm_head(
        quantize_model_params(fuse_llama_projections(params), "int8"), "int8"
    ))
    decode_ok = False
    try:
        cache = model.init_kv_cache(2, 128, jnp.bfloat16)
        toks = jnp.array([[3, 1, 4, 1, 5], [9, 2, 6, 5, 3]], jnp.int32)
        logits, cache = jax.jit(model.forward_with_cache)(
            qparams, toks, cache, 0
        )
        step = jax.jit(model.forward_with_cache, donate_argnums=(2,))
        nxt = jnp.argmax(logits[:, -1:, : cfg.vocab_size], -1).astype(jnp.int32)
        for pos in (5, 6, 7):
            logits, cache = step(qparams, nxt, cache, pos)
            nxt = jnp.argmax(
                logits[:, -1:, : cfg.vocab_size], -1
            ).astype(jnp.int32)
        import numpy as np

        decode_ok = bool(np.isfinite(np.asarray(logits, np.float32)).all())
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        kc["detail"]["decode_smoke"] = {"pass": False,
                                        "error": f"{type(e).__name__}: {e}"[:200]}
    kc["detail"]["decode_smoke"] = kc["detail"].get(
        "decode_smoke", {"pass": decode_ok}
    )

    status_ok = check_status_header()
    kc["detail"]["status_header"] = status_ok
    try:
        llama = bench_llama_decode()
        reg = check_dtype_regression(llama)
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        reg = {"pass": False, "error": f"{type(e).__name__}: {e}"[:200]}
    kc["detail"]["dtype_regression"] = reg

    all_ok = ok and decode_ok and status_ok["pass"] and reg["pass"]
    result = {
        "metric": "preflight",
        "value": int(all_ok),
        "unit": ("1 = kernel checks + decode smoke + STATUS header + "
                 "per-dtype no-regression"),
        "vs_baseline": float(all_ok),
        "detail": kc["detail"],
    }
    print(json.dumps(result))
    if not all_ok:
        raise SystemExit(1)
    return result


def bench_engine_serving() -> dict:
    """On-chip continuous-batching serving (VERDICT r5 item 5): Llama-1B
    INT8, paged KV, 24 mixed-length requests; speculative decoding off and
    on (tiny random draft — measures the spec machinery's cost at ~zero
    acceptance, the worst case; real drafts only help)."""
    from benchmarks.engine_bench import run as engine_run

    import mila_tpu

    mila_tpu.initialize(0)
    base = engine_run(scale="llama-1b", quantize="int8", requests=24,
                      max_batch=8, new_tokens=64, max_len=512)
    try:
        # Contiguous layout + the whole-model giga decode kernel: the
        # flagship decode path serving end-to-end.
        giga = engine_run(scale="llama-1b", quantize="int8", requests=24,
                          max_batch=8, new_tokens=64, max_len=512,
                          layout="contiguous")
        base["detail"]["giga_contiguous"] = giga["detail"] | {
            "tok_s": giga["value"]}
        if giga["value"] > base["value"]:
            base["value"] = giga["value"]
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        base["detail"]["giga_contiguous"] = {
            "error": f"{type(e).__name__}: {e}"[:200]}
    try:
        spec = engine_run(scale="llama-1b", quantize="int8", requests=12,
                          max_batch=8, new_tokens=64, max_len=512,
                          speculative_k=4)
        base["detail"]["speculative"] = spec["detail"] | {
            "tok_s": spec["value"]}
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        base["detail"]["speculative"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    return base


BENCHES = {
    "llama": bench_llama_decode,
    "mnist": bench_mnist_training,
    "gpt2": bench_gpt2_decode,
    "flash": bench_flash_prefill,
    "paged": bench_paged_decode,
    "engine": bench_engine_serving,
    "kernel_check": kernel_check,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="auto",
                    choices=["auto", *BENCHES, "all", "preflight"])
    args = ap.parse_args()
    if args.what == "preflight":
        preflight()
        return 0
    if args.what == "all":
        for name, fn in BENCHES.items():
            try:
                print(json.dumps(fn()))
            except Exception:  # noqa: BLE001
                traceback.print_exc()
        return 0
    if args.what in ("auto", "llama"):
        try:
            result = bench_llama_decode()
            # Fold the self-grading suite into the one driver-visible JSON
            # line: on-chip kernel-vs-oracle checks, flash prefill TFLOP/s,
            # and paged-attention streaming (all cheap next to the llama
            # bench thanks to the persistent compile cache).
            for name, fn in (("kernel_check", kernel_check),
                             ("flash", bench_flash_prefill),
                             ("paged", bench_paged_decode),
                             ("engine", bench_engine_serving)):
                try:
                    sub = fn()
                    result["detail"][name] = {
                        "value": sub["value"], "unit": sub["unit"],
                        "vs_baseline": sub["vs_baseline"],
                        **({"detail": sub["detail"]} if name != "kernel_check"
                           else {}),
                    }
                except Exception as e:  # noqa: BLE001
                    traceback.print_exc()
                    result["detail"][name] = {
                        "error": f"{type(e).__name__}: {e}"[:200]
                    }
            print(json.dumps(result))
            return 0
        except Exception:  # noqa: BLE001 - fall back to the MNIST metric
            if args.what == "llama":
                raise
            traceback.print_exc()
        print(json.dumps(bench_mnist_training()))
        return 0
    print(json.dumps(BENCHES[args.what]()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
