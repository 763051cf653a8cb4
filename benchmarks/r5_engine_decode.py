"""Bisect the engine giga-decode slowdown: llama_bench's giga loop runs
2.24 ms/step, the engine's scan-based chunk measured 16 ms/step on the
same kernel. Variants isolate the difference (cond-sampling, key/pos
threading, scan-vs-fori).

Usage: python benchmarks/r5_engine_decode.py [variants...]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import benchmarks  # noqa: F401 - compile cache

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from benchmarks.llama_bench import build_model

    import mila_tpu
    from mila_tpu.inference.quantize import quantize_model_params
    from mila_tpu.models.llama import (
        add_quantized_lm_head,
        fuse_llama_projections,
        pack_decode_giga,
    )

    mila_tpu.initialize(0)
    model, params, cfg = build_model("1b", "bfloat16")
    params = pack_decode_giga(
        add_quantized_lm_head(
            quantize_model_params(fuse_llama_projections(params), "int8"),
            "int8"), cfg)
    assert "giga_pack" in params
    B, T = 8, 512
    V = cfg.vocab_size
    cache = model.init_kv_cache(B, T, jnp.bfloat16)
    prompt = jax.random.randint(jax.random.key(1), (B, 100), 0, V)
    _, cache = jax.jit(
        lambda p, t, c: model.forward_with_cache(p, t, c, 0))(
            params, prompt, cache)
    kp0, vp0 = jax.jit(model.stack_kv_cache)(cache)
    pos0 = jnp.full((B,), 100, jnp.int32)
    tok0 = jnp.zeros((B, 1), jnp.int32)
    greedy = jnp.ones((B,), bool)
    temps = jnp.ones((B,), jnp.float32)
    key0 = jax.random.key(0)
    chunk = 8

    def sample_cond(logits, k, tok_g):
        def do_sample(_):
            scaled = logits[:, :V].astype(jnp.float32) / temps[:, None]
            s = jax.random.categorical(k, scaled, axis=-1).astype(jnp.int32)
            return jnp.where(greedy, tok_g, s)

        return jax.lax.cond(jnp.all(greedy), lambda _: tok_g, do_sample,
                            None)

    # A: fori_loop, greedy only (llama_bench shape)
    @functools.partial(jax.jit, donate_argnums=(1,))
    def var_a(params, pools, tok, pos, n):
        kp, vp = pools

        def body(_, c):
            tok, kp, vp, pos = c
            tok, _lg, kp, vp = model.giga_step(params, tok, kp, vp, pos)
            return tok, kp, vp, pos + 1

        tok, kp, vp, pos = jax.lax.fori_loop(0, n, body, (tok, kp, vp, pos))
        return tok[0, 0], (kp, vp), pos

    # B: engine-shaped scan (cond sampling + key threading + stacked toks)
    @functools.partial(jax.jit, donate_argnums=(1,))
    def var_b(params, pools, tok, pos, key, n_chunks):
        kp, vp = pools

        def chunk_body(_, c):
            tok, kp, vp, pos, key = c
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, chunk)

            def body(carry, k):
                toks, kp, vp, pos = carry
                tok_g, logits, kp, vp = model.giga_step(
                    params, toks, kp, vp, pos)
                nxt = sample_cond(logits, k, tok_g[:, 0])
                return (nxt[:, None], kp, vp, pos + 1), nxt

            (tok, kp, vp, pos), toks = jax.lax.scan(
                body, (tok, kp, vp, pos), keys)
            return tok, kp, vp, pos, key

        tok, kp, vp, pos, key = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (tok, kp, vp, pos, key))
        return tok[0, 0], (kp, vp), pos

    # C: scan, greedy only (no sampling cond, no keys)
    @functools.partial(jax.jit, donate_argnums=(1,))
    def var_c(params, pools, tok, pos, n_chunks):
        kp, vp = pools

        def chunk_body(_, c):
            tok, kp, vp, pos = c

            def body(carry, _x):
                toks, kp, vp, pos = carry
                tok_g, _lg, kp, vp = model.giga_step(
                    params, toks, kp, vp, pos)
                return (tok_g, kp, vp, pos + 1), tok_g[:, 0]

            (tok, kp, vp, pos), _ = jax.lax.scan(
                body, (tok, kp, vp, pos), None, length=chunk)
            return tok, kp, vp, pos

        tok, kp, vp, pos = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (tok, kp, vp, pos))
        return tok[0, 0], (kp, vp), pos

    variants = sys.argv[1:] or ["a", "b", "c"]
    for name in variants:
        pools = (kp0 + 0, vp0 + 0)
        tok, pos = tok0, pos0

        if name == "a":
            f = lambda pools, n: var_a(params, pools, tok, pos, n * chunk)
        elif name == "b":
            f = lambda pools, n: var_b(params, pools, tok, pos, key0, n)
        else:
            f = lambda pools, n: var_c(params, pools, tok, pos, n)

        def run(n, pools_box=[pools]):
            t0 = time.perf_counter()
            acc, new_pools, _ = f(pools_box[0], jnp.int32(n))
            float(acc)
            pools_box[0] = new_pools
            return time.perf_counter() - t0

        run(1)
        t1 = min(run(4) for _ in range(3))
        t2 = min(run(8) for _ in range(3))
        per = (t2 - t1) / (4 * chunk)
        print(f"variant {name}: {per*1e3:.3f} ms/step")


if __name__ == "__main__":
    main()
