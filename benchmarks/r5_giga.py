"""On-chip gate for the whole-model giga decode kernel
(kernels/decode_giga.py): numerics vs the jnp oracle at small AND full
Llama-1B shapes, then per-step timing at bench shapes.

Usage: python benchmarks/r5_giga.py [--full] [--time] [--batch 8]
       [--ctx 512] [--live 192] [--dtype int8]
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


def build(dtype, *, L, H, I, NH, NKV, HD, VPAD, vocab):
    from mila_tpu.inference.quantize import quantize
    from mila_tpu.kernels.decode_giga import pack_giga

    KD, NQ = NKV * HD, NH * HD
    key = jax.random.key(0)

    def q(k, shape):
        w = jax.random.normal(jax.random.fold_in(key, k), shape) * 0.02
        if dtype == "bf16":
            from mila_tpu.inference.quantize import unit_qtensor

            return unit_qtensor(w)
        return quantize(w, dtype)

    layers = [(q(10 * i, (NQ, H)), q(10 * i + 1, (H, 2 * I)),
               q(10 * i + 2, (I, H)), q(10 * i + 3, (H, NQ + 2 * KD)))
              for i in range(L)]
    head = q(999, (H, VPAD))
    ga = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 90), (L, H))
    gm = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 91), (L, H))
    gf = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 92), (H,))
    from mila_tpu.ops.rope import rope_frequencies

    pack = pack_giga(layers, head, ga, gm, gf, nh=NH, nkv=NKV, hd=HD,
                     vocab=vocab,
                     rope_inv_freq=rope_frequencies(HD, 500000.0, None))
    assert pack is not None
    return pack


def run_case(name, dims, B, T, live, dtype, do_time, skip_numerics=False):
    from mila_tpu.kernels.decode_giga import giga_decode_step

    L, H, I, NH, NKV, HD = (dims[k] for k in
                            ("L", "H", "I", "NH", "NKV", "HD"))
    KD = NKV * HD
    pack = build(dtype, **dims)
    key = jax.random.key(1)
    x = jax.random.normal(key, (B, H), jnp.bfloat16)
    lens = jnp.minimum(
        jnp.array([live + 7 * i for i in range(B)], jnp.int32), T - 1)
    d2 = HD // 2
    inv = 1.0 / (500000.0 ** (jnp.arange(d2, dtype=jnp.float32) / d2))
    ang = lens[:, None].astype(jnp.float32) * inv[None]
    c2, s2 = jnp.cos(ang), jnp.sin(ang)
    cos_t = jnp.tile(jnp.concatenate([c2, c2], -1), (1, NKV))
    sin_t = jnp.tile(jnp.concatenate([-s2, s2], -1), (1, NKV))

    def pools(seed):
        return (jax.random.normal(jax.random.fold_in(key, 100 + seed),
                                  (L, B, T, KD), jnp.bfloat16),
                jax.random.normal(jax.random.fold_in(key, 200 + seed),
                                  (L, B, T, KD), jnp.bfloat16))

    kp, vp = pools(0)
    if not skip_numerics:
        got = giga_decode_step(x, cos_t, sin_t, lens, pack, kp, vp,
                               interpret=False)
        want = giga_decode_step(x, cos_t, sin_t, lens, pack, kp, vp,
                                interpret=True)
        # Tolerances: compiled-vs-oracle drift COMPOUNDS through the
        # residual stream (bf16 rounding at different points in each
        # implementation) — measured 0.11 max logit err at L=16 vs 0.05 at
        # L=2 on identical code. Gate on token agreement (>= 7/8 greedy
        # tokens; random-weight logits have near-ties) plus a depth-scaled
        # logit tolerance.
        tok_g = np.asarray(got[0]).reshape(-1)
        tok_w = np.asarray(want[0]).reshape(-1)
        agree = int((tok_g == tok_w).sum())
        ok_tok = agree >= (len(tok_g) * 7) // 8
        print(f"{name} token agreement: {agree}/{len(tok_g)} "
              f"{'PASS' if ok_tok else 'FAIL'}")
        names = ("logits", "k_pool", "v_pool")
        tol = 5e-2 * max(1.0, L / 4)
        for nm, g, wv in zip(names, got[1:], want[1:]):
            g = np.asarray(g, np.float32)
            wv = np.asarray(wv, np.float32)
            if nm == "logits":
                g = np.where(np.isfinite(g), g, 0.0)
                wv = np.where(np.isfinite(wv), wv, 0.0)
            err = float(np.max(np.abs(g - wv))) if g.size else 0.0
            ok = np.allclose(g, wv, rtol=5e-2, atol=tol)
            print(f"{name} {nm}: max_abs_err={err:.5f} (atol {tol:.3f}) "
                  f"{'PASS' if ok else 'FAIL'}")

    if not do_time:
        return

    # The pack is a jit ARGUMENT (a closure-captured 1.2GB array becomes a
    # module constant and blows the compile).
    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def chain(n, pk, kp, vp, x):
        def body(_, c):
            kp, vp, x = c
            tok, _lg, kp, vp = giga_decode_step(x, cos_t, sin_t, lens, pk,
                                                kp, vp, interpret=False)
            # feed a token-dependent perturbation back so the loop can't be
            # hoisted (embedding lookup stands outside the kernel in prod)
            x = x + (tok[0, 0] * 1e-20).astype(x.dtype)
            return kp, vp, x

        kp, vp, x = jax.lax.fori_loop(0, n, body, (kp, vp, x))
        return x[0, 0].astype(jnp.float32), kp, vp

    kp, vp = pools(1)

    def run(n):
        nonlocal kp, vp
        t0 = time.perf_counter()
        acc, kp, vp = chain(jnp.int32(n), pack, kp, vp, x)
        float(acc)
        return time.perf_counter() - t0

    run(2)
    n = 64
    r1 = [run(n) for _ in range(4)]
    r2 = [run(2 * n) for _ in range(4)]
    print("raw t1:", [round(v, 4) for v in r1])
    print("raw t2:", [round(v, 4) for v in r2])
    t1, t2 = min(r1), min(r2)
    per = (t2 - t1) / n
    wbytes = pack.w.nbytes + pack.s.nbytes
    kvb = 2 * L * B * int(np.mean(np.asarray(lens))) * KD * 2
    bound = (wbytes + kvb) / 819e9
    print(f"{name}: {per*1e3:.3f} ms/step (roofline {bound*1e3:.3f} ms "
          f"-> frac {bound/per:.3f}); weights {wbytes/1e6:.0f} MB at "
          f"{wbytes/per/1e9:.0f} GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--live", type=int, default=192)
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--skip-numerics", action="store_true")
    args = ap.parse_args()

    if not args.full:
        tiny = dict(L=2, H=512, I=1024, NH=8, NKV=8, HD=64, VPAD=1024,
                    vocab=1000)
        run_case("tiny", tiny, 4, 128, 64, args.dtype, args.time,
                 args.skip_numerics)
    else:
        full = dict(L=16, H=2048, I=8192, NH=32, NKV=8, HD=64,
                    VPAD=129024, vocab=128256)
        run_case("full-1b", full, args.batch, args.ctx, args.live,
                 args.dtype, args.time, args.skip_numerics)


if __name__ == "__main__":
    main()
