"""Where do 154 us/layer go? The kernels alone account for ~110.

Times an 8-layer chain of the EXACT fused-decode layer body with pieces
toggled off; the delta against the full body attributes the glue
(pack_queries einsum, cache DUS, kernel boundaries).

Usage: python benchmarks/r4_layer.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import benchmarks  # noqa: F401

import jax
import jax.numpy as jnp

L, B, T, NKV, HD, NH = 8, 8, 512, 8, 64, 32
H, I = 2048, 8192
KD, NQ = NKV * HD, NH * HD
POS = 192


def build():
    from mila_tpu.inference.quantize import quantize
    from mila_tpu.kernels.layer_fused import pack_layer
    from mila_tpu.kernels.layer_stream import pack_layer_stream

    key = jax.random.key(0)
    wo_q = quantize(jax.random.normal(key, (H, H)) * 0.02, "int8")
    wgu_q = quantize(jax.random.normal(key, (H, 2 * I)) * 0.02, "int8")
    down_q = quantize(jax.random.normal(key, (I, H)) * 0.02, "int8")
    wqkv_q = quantize(jax.random.normal(key, (H, NQ + 2 * KD)) * 0.02, "int8")
    packs = [pack_layer(wo_q, wgu_q, down_q, wqkv_q, bn=512)
             for _ in range(L - 1)]
    packs.append(pack_layer(wo_q, wgu_q, down_q, None, bn=512))
    stream = pack_layer_stream(packs)

    def make_caches():
        return [
            {"k": jax.random.normal(jax.random.fold_in(key, 100 + i),
                                    (B, T, NKV, HD), jnp.bfloat16),
             "v": jax.random.normal(jax.random.fold_in(key, 200 + i),
                                    (B, T, NKV, HD), jnp.bfloat16)}
            for i in range(L)
        ]

    gm = jnp.ones((H,), jnp.float32)
    return stream, make_caches, gm


def run_variant(name, stream, make_caches, gm, *, att_on=True, tail_on=True,
                pack_on=True, dus_on=True):
    caches = make_caches()
    from mila_tpu.kernels.dense_attention import (
        fused_decode_attention, pack_queries,
    )
    from mila_tpu.kernels.layer_stream import layer_tail_stream

    old_lens = jnp.full((B,), POS, jnp.int32)
    cos_t = jnp.ones((B, KD), jnp.float32)
    sin_t = jnp.zeros((B, KD), jnp.float32)
    const_qpk = jnp.ones((B, NH, KD), jnp.bfloat16)
    const_att = jnp.ones((B, NH, HD), jnp.bfloat16)

    nonlocal_stream = [stream]

    def step(x, qkv, caches):
        stream = nonlocal_stream[0]
        new_caches = []
        for i in range(L):
            lc = caches[i]
            qkv2 = qkv.reshape(B, NQ + 2 * KD)
            if pack_on:
                q_pk = pack_queries(qkv2[:, :NQ].reshape(B, NH, HD), NKV)
            else:
                q_pk = const_qpk + qkv2[:, :1, None] * 0
            if att_on:
                att, k_new, kco, vco = fused_decode_attention(
                    qkv2, q_pk, cos_t, sin_t, lc["k"], lc["v"], old_lens,
                    num_heads=NH)
                lc = {"k": kco, "v": vco}
            else:
                att = const_att + q_pk[:, :, :HD] * 0
                k_new = qkv2[:, NQ : NQ + KD]
            if dus_on:
                lc = {
                    "k": jax.lax.dynamic_update_slice(
                        lc["k"], k_new.reshape(B, 1, NKV, HD).astype(
                            lc["k"].dtype), (0, POS, 0, 0)),
                    "v": jax.lax.dynamic_update_slice(
                        lc["v"], qkv2[:, NQ + KD:].reshape(
                            B, 1, NKV, HD).astype(lc["v"].dtype),
                        (0, POS, 0, 0)),
                }
            new_caches.append(lc)
            if tail_on:
                x, qkv_n = layer_tail_stream(
                    att.reshape(B, NQ), x, gm, stream, i,
                    gm if i + 1 < L else None)
                qkv = (qkv_n if qkv_n is not None
                       else qkv + x[:, :1] * 0)
            else:
                x = x + att.reshape(B, NQ)[:, :H] * 0
                qkv = qkv + x[:, :1] * 0
        return x, qkv, new_caches

    # Caches are DONATED args threaded back out — the in-place-update
    # regime the model runs in (benchmarks/r4_dus.py v6 vs v7).
    import functools

    @functools.partial(jax.jit, donate_argnums=tuple(range(4, 4 + 2 * L)))
    def chain(n, x, qkv, stream_arg, *flat):
        nonlocal_stream[0] = stream_arg
        cs = [{"k": flat[2 * i], "v": flat[2 * i + 1]} for i in range(L)]
        x, qkv, cs = jax.lax.fori_loop(
            0, n, lambda _, c: step(*c), (x, qkv, cs))
        out = []
        for c in cs:
            out += [c["k"], c["v"]]
        return x[0, 0].astype(jnp.float32), tuple(out)

    key = jax.random.key(7)
    x0 = jax.random.normal(key, (B, H), jnp.bfloat16)
    qkv0 = jax.random.normal(key, (B, NQ + 2 * KD), jnp.bfloat16)
    flat = []
    for c in caches:
        flat += [c["k"], c["v"]]
    flat = tuple(flat)
    r, flat = chain(jnp.int32(2), x0, qkv0, stream, *flat)
    float(r)

    def best(n, reps=3):
        nonlocal flat
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r, flat = chain(jnp.int32(n), x0, qkv0, stream, *flat)
            float(r)
            b = min(b, time.perf_counter() - t0)
        return b

    best(32)
    t1, t2 = best(32), best(128)
    per = (t2 - t1) / 96 / L
    print(f"{name:34s} {per*1e6:8.1f} us/layer", flush=True)
    return per


def main():
    stream, make_caches, gm = build()
    run_variant("full body", stream, make_caches, gm)
    run_variant("no attention kernel", stream, make_caches, gm, att_on=False)
    run_variant("no tail kernel", stream, make_caches, gm, tail_on=False)
    run_variant("no pack_queries", stream, make_caches, gm, pack_on=False)
    run_variant("no cache DUS", stream, make_caches, gm, dus_on=False)
    run_variant("attention only", stream, make_caches, gm, tail_on=False,
                dus_on=False)
    run_variant("tail only", stream, make_caches, gm, att_on=False,
                dus_on=False)


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    main()
