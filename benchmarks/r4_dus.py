"""Why does the loop-carried stacked-cache DUS copy? Variant isolation.

Usage: python benchmarks/r4_dus.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import benchmarks  # noqa: F401

import jax
import jax.numpy as jnp

L, B, T, NKV, HD = 16, 8, 512, 8, 64
KD = NKV * HD


def timeit(name, make_chain):
    chain = jax.jit(make_chain())
    float(chain(jnp.int32(2)))

    def best(n, reps=3):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(jnp.int32(n)))
            b = min(b, time.perf_counter() - t0)
        return b

    best(64)
    t1, t2 = best(64), best(256)
    per = (t2 - t1) / 192
    print(f"{name:44s} {per*1e6:8.1f} us", flush=True)


def main():
    key = jax.random.key(0)
    kc0 = jax.random.normal(key, (L, B, T, NKV, HD), jnp.bfloat16)
    kn0 = jax.random.normal(key, (L, B, 1, NKV, HD), jnp.bfloat16)

    def v1():  # single cache, dynamic pos, no other cache reads
        def chain(n):
            def body(i, kc):
                pos = jax.lax.rem(i, T - 1)
                return jax.lax.dynamic_update_slice(
                    kc, kn0, (0, 0, pos, 0, 0))

            kc = jax.lax.fori_loop(0, n, body, kc0)
            return kc[0, 0, 0, 0, 0].astype(jnp.float32)

        return chain

    def v2():  # static pos
        def chain(n):
            def body(i, kc):
                return jax.lax.dynamic_update_slice(
                    kc, kn0, (0, 0, 17, 0, 0))

            kc = jax.lax.fori_loop(0, n, body, kc0)
            return kc[0, 0, 0, 0, 0].astype(jnp.float32)

        return chain

    def v3():  # update depends on a read of the cache (real decode shape)
        def chain(n):
            def body(i, kc):
                pos = jax.lax.rem(i, T - 1)
                kn = kn0 + (kc[0, 0, 0, 0, 0] * 1e-20).astype(kn0.dtype)
                return jax.lax.dynamic_update_slice(
                    kc, kn, (0, 0, pos, 0, 0))

            kc = jax.lax.fori_loop(0, n, body, kc0)
            return kc[0, 0, 0, 0, 0].astype(jnp.float32)

        return chain

    def v4():  # token-major contiguous layout [T, L*B*KD]
        cc0 = jax.random.normal(key, (T, L * B * KD), jnp.bfloat16)
        un0 = jax.random.normal(key, (1, L * B * KD), jnp.bfloat16)

        def chain(n):
            def body(i, cc):
                pos = jax.lax.rem(i, T - 1)
                return jax.lax.dynamic_update_slice(cc, un0, (pos, 0))

            cc = jax.lax.fori_loop(0, n, body, cc0)
            return cc[0, 0].astype(jnp.float32)

        return chain

    def v5():  # per-layer separate caches (r2 wiring), one DUS each
        caches0 = tuple(
            jax.random.normal(jax.random.fold_in(key, i),
                              (B, T, NKV, HD), jnp.bfloat16)
            for i in range(L)
        )
        knl = kn0[0]

        def chain(n):
            def body(i, caches):
                pos = jax.lax.rem(i, T - 1)
                return tuple(
                    jax.lax.dynamic_update_slice(c, knl, (0, pos, 0, 0))
                    for c in caches
                )

            caches = jax.lax.fori_loop(0, n, body, caches0)
            return caches[0][0, 0, 0, 0].astype(jnp.float32)

        return chain

    timeit("v1 stacked dyn-pos, no read", v1)
    timeit("v2 stacked static pos", v2)
    timeit("v3 stacked dyn-pos + cache-read dep", v3)
    timeit("v4 [T, LBK] contiguous dyn-pos", v4)
    timeit("v5 16 per-layer caches dyn-pos", v5)


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    main()


def extra():
    key = jax.random.key(0)
    kc0 = jax.random.normal(key, (L, B, T, NKV, HD), jnp.bfloat16)
    vc0 = jax.random.normal(key, (L, B, T, NKV, HD), jnp.bfloat16)
    kn0 = jax.random.normal(key, (L, B, 1, NKV, HD), jnp.bfloat16)

    def v6():  # two stacked carries (k+v), dep, closed-over init
        def chain(n):
            def body(i, carry):
                kc, vc = carry
                pos = jax.lax.rem(i, T - 1)
                kn = kn0 + (kc[0, 0, 0, 0, 0] * 1e-20).astype(kn0.dtype)
                kc = jax.lax.dynamic_update_slice(kc, kn, (0, 0, pos, 0, 0))
                vc = jax.lax.dynamic_update_slice(vc, kn0, (0, 0, pos, 0, 0))
                return kc, vc

            kc, vc = jax.lax.fori_loop(0, n, body, (kc0, vc0))
            return (kc[0, 0, 0, 0, 0] + vc[0, 0, 0, 0, 0]).astype(jnp.float32)

        return chain

    timeit("v6 two stacked carries + dep", v6)

    # v7: caches as jit ARGS (the llama bench passes cache2 each call)
    import time as _t

    def chain_v7(n, kc, vc, kn):
        def body(i, carry):
            kc, vc = carry
            pos = jax.lax.rem(i, T - 1)
            kn2 = kn + (kc[0, 0, 0, 0, 0] * 1e-20).astype(kn.dtype)
            kc = jax.lax.dynamic_update_slice(kc, kn2, (0, 0, pos, 0, 0))
            vc = jax.lax.dynamic_update_slice(vc, kn, (0, 0, pos, 0, 0))
            return kc, vc

        kc, vc = jax.lax.fori_loop(0, n, body, (kc, vc))
        return (kc[0, 0, 0, 0, 0] + vc[0, 0, 0, 0, 0]).astype(jnp.float32)

    cj = jax.jit(chain_v7)
    float(cj(jnp.int32(2), kc0, vc0, kn0))

    def best(n, reps=3):
        b = float("inf")
        for _ in range(reps):
            t0 = _t.perf_counter()
            float(cj(jnp.int32(n), kc0, vc0, kn0))
            b = min(b, _t.perf_counter() - t0)
        return b

    best(64)
    t1, t2 = best(64), best(256)
    print(f"{'v7 caches as jit args':44s} {(t2-t1)/192*1e6:8.1f} us",
          flush=True)


extra()
