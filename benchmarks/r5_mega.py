"""Round-5 gate for the single-kernel decode layer (kernels/layer_mega.py):
compile + numerics + per-layer timing at FULL Llama-3.2-1B shape on chip,
against the shipping two-kernel layer_stream wiring (VERDICT r5 item 1).

The r4 failure mode was designing the fix and never running it at
H=2048/I=8192 where scoped-VMEM fit is the risk. This script answers, with
hardware numbers: does mega fit, is it right, and is it faster?

Usage: python benchmarks/r5_mega.py [--batch 8] [--ctx 512] [--live 192]
       [--layers 8] [--dtype int8]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import benchmarks  # noqa: F401 - compile cache

import jax
import jax.numpy as jnp
import numpy as np

# Llama-3.2-1B
NH, NKV, HD, H, I = 32, 8, 64, 2048, 8192
KD, NQ = NKV * HD, NH * HD


def build(dtype: str, n_layers: int):
    from mila_tpu.inference.quantize import quantize
    from mila_tpu.kernels.layer_mega import pack_mega_layer
    from mila_tpu.kernels.layer_stream import pack_layer_stream
    from mila_tpu.kernels.layer_fused import pack_layer

    key = jax.random.key(0)

    def q(k, shape):
        return quantize(jax.random.normal(jax.random.fold_in(key, k), shape)
                        * 0.02, dtype)

    layers = []
    for i in range(n_layers):
        wo = q(10 * i, (NQ, H))
        wgu = q(10 * i + 1, (H, 2 * I))
        down = q(10 * i + 2, (I, H))
        wqkv = q(10 * i + 3, (H, NQ + 2 * KD))
        layers.append((wo, wgu, down, wqkv))

    megas = []
    for i, (wo, wgu, down, wqkv) in enumerate(layers):
        nxt = layers[i + 1][3] if i + 1 < n_layers else None
        megas.append(pack_mega_layer(wo, wgu, down, nxt, nh=NH, nkv=NKV,
                                     hd=HD, bn=512))
    packs = [pack_layer(wo, wgu, down,
                        layers[i + 1][3] if i + 1 < n_layers else None,
                        bn=512)
             for i, (wo, wgu, down, wqkv) in enumerate(layers)]
    stream = pack_layer_stream(packs)
    return layers, megas, stream


def timed(fn, *args, reps=5):
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--live", type=int, default=192)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--skip-numerics", action="store_true")
    args = ap.parse_args()
    B, T, L = args.batch, args.ctx, args.layers

    from mila_tpu.kernels.layer_mega import layer_megakernel
    from mila_tpu.kernels.layer_stream import layer_tail_stream
    from mila_tpu.kernels.dense_attention import (
        fused_decode_attention, pack_queries,
    )
    from mila_tpu.kernels.decode_fused import rms_quant_linear

    layers, megas, stream = build(args.dtype, L)
    key = jax.random.key(1)
    qkv0 = jax.random.normal(key, (B, NQ + 2 * KD), jnp.bfloat16)
    x0 = jax.random.normal(jax.random.fold_in(key, 1), (B, H), jnp.bfloat16)
    gm = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (H,))
    lens = jnp.full((B,), args.live, jnp.int32)
    d2 = HD // 2
    inv = 1.0 / (500000.0 ** (jnp.arange(d2, dtype=jnp.float32) / d2))
    ang = lens[:, None].astype(jnp.float32) * inv[None]
    c2, s2 = jnp.cos(ang), jnp.sin(ang)
    cos_t = jnp.tile(jnp.concatenate([c2, c2], -1), (1, NKV))
    sin_t = jnp.tile(jnp.concatenate([-s2, s2], -1), (1, NKV))

    def make_caches(seed):
        return (
            [jax.random.normal(jax.random.fold_in(key, 100 + seed * 1000 + i),
                               (B, T, NKV, HD), jnp.bfloat16) for i in range(L)],
            [jax.random.normal(jax.random.fold_in(key, 500 + seed * 1000 + i),
                               (B, T, NKV, HD), jnp.bfloat16) for i in range(L)],
        )

    # ---- single-layer numerics: compiled vs interpret oracle ----
    if not args.skip_numerics:
        kcs, vcs = make_caches(0)
        got = layer_megakernel(qkv0, x0, gm, megas[0], kcs[0], vcs[0], lens,
                               cos_t, sin_t, gm, num_heads=NH,
                               interpret=False)
        want = layer_megakernel(qkv0, x0, gm, megas[0], kcs[0], vcs[0], lens,
                                cos_t, sin_t, gm, num_heads=NH,
                                interpret=True)
        for nm, g, w in zip(("x_out", "qkv_next", "kc", "vc"), got, want):
            g = np.asarray(g, np.float32)
            w = np.asarray(w, np.float32)
            err = float(np.max(np.abs(g - w)))
            rel = err / (float(np.max(np.abs(w))) + 1e-9)
            ok = np.allclose(g, w, rtol=5e-2, atol=5e-2)
            print(f"numerics {nm}: max_abs_err={err:.5f} rel={rel:.5f} "
                  f"{'PASS' if ok else 'FAIL'}")

    # ---- L-layer chain timing: mega vs stream ----
    # Donated caches + traced-trip-count fori_loop + n/2n delta timing:
    # the tunneled chip has ~30ms fixed host-fetch overhead per call.
    def mega_step(qkv, x, kcs, vcs):
        for i in range(L):
            x, qkv2, kcs[i], vcs[i] = layer_megakernel(
                qkv, x, gm, megas[i], kcs[i], vcs[i], lens, cos_t, sin_t,
                gm, num_heads=NH)
            qkv = qkv2 if qkv2 is not None else qkv
        return qkv, x, kcs, vcs

    def stream_step(qkv, x, kcs, vcs):
        for i in range(L):
            qkv2 = qkv.reshape(B, NQ + 2 * KD)
            q_pk = pack_queries(qkv2[:, :NQ].reshape(B, NH, HD), NKV)
            att, _kn, kcs[i], vcs[i] = fused_decode_attention(
                qkv2, q_pk, cos_t, sin_t, kcs[i], vcs[i], lens, num_heads=NH)
            x2, qkv = layer_tail_stream(
                att.reshape(B, 1, NQ), x.reshape(B, 1, H), gm, stream, i, gm)
            x = x2.reshape(B, H)
            if qkv is None:
                qkv = qkv2
        return qkv, x, kcs, vcs

    def make_chain(step):
        @functools.partial(jax.jit, donate_argnums=(3, 4))
        def chain(n, qkv, x, kcs, vcs):
            def body(_, c):
                qkv, x, kcs, vcs = c
                qkv, x, kcs, vcs = step(qkv, x, list(kcs), list(vcs))
                return (qkv, x, tuple(kcs), tuple(vcs))

            qkv, x, kcs, vcs = jax.lax.fori_loop(
                0, n, body, (qkv, x, tuple(kcs), tuple(vcs)))
            return x[0, 0].astype(jnp.float32), kcs, vcs
        return chain

    def bench_chain(chain):
        kcs, vcs = make_caches(1)
        kcs, vcs = tuple(kcs), tuple(vcs)

        def run(n):
            nonlocal kcs, vcs
            t0 = time.perf_counter()
            acc, kcs, vcs = chain(jnp.int32(n), qkv0, x0, kcs, vcs)
            float(acc)
            return time.perf_counter() - t0

        run(2)  # compile + warm
        n = 32
        t1 = min(run(n) for _ in range(3))
        t2 = min(run(2 * n) for _ in range(3))
        return (t2 - t1) / n

    for name, step in (("mega", mega_step), ("stream", stream_step)):
        try:
            t = bench_chain(make_chain(step))
            per_layer = t / L * 1e6
            wb = megas[0].w.nbytes + megas[0].s.nbytes
            kvb = 2 * B * args.live * KD * 2
            bound = (wb + kvb) / 819e9 * 1e6
            print(f"{name}: {t*1e3:.3f} ms / {L} layers = "
                  f"{per_layer:.1f} us/layer (stream+kv bound ~{bound:.1f})")
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
