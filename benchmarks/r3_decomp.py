"""Round-3 decode-step decomposition: where does the per-token time go?

The r2 sweep accounts for ~1.78 ms of the 2.27 ms INT8 decode step as
weight-stream matmuls; this measures the rest — attention over the dense
KV cache, rope, the logits argmax — each as its own jitted fori_loop on
chip, so the megakernel work targets the real gap.

Usage: python benchmarks/r3_decomp.py [--batch 8] [--ctx 512]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import benchmarks  # noqa: F401

import jax
import jax.numpy as jnp

from benchmarks.decode_sweep import timed_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=512)
    args = ap.parse_args()
    print("devices:", jax.devices(), file=sys.stderr)

    from mila_tpu import ops

    B, ctx = args.batch, args.ctx
    NH, NKV, HD, H, V, L = 32, 8, 64, 2048, 129024, 16
    key = jax.random.key(0)

    # --- decode attention over the dense cache (one layer) ---
    q = jax.random.normal(key, (B, 1, NH, HD), jnp.bfloat16)
    kc = jax.random.normal(key, (B, ctx, NKV, HD), jnp.bfloat16)
    vc = jax.random.normal(key, (B, ctx, NKV, HD), jnp.bfloat16)
    lens = jnp.full((B,), ctx, jnp.int32)
    t = timed_loop(
        lambda q: ops.decode_attention(q, kc, vc, lens).astype(q.dtype), q
    )
    kv_bytes = 2 * B * ctx * NKV * HD * 2
    print(f"decode_attention (1 layer, ctx {ctx}): {t*1e6:7.1f} us  "
          f"{kv_bytes/t/1e9:5.0f} GB/s  -> x{L} = {t*L*1e3:.3f} ms", flush=True)

    # --- rope (cos/sin build + 2 applies, one layer) ---
    pos = jnp.full((B,), ctx, jnp.int32)
    kq = jax.random.normal(key, (B, 1, NKV, HD), jnp.bfloat16)

    def rope_step(q):
        cos, sin = ops.rope_cos_sin(pos[:, None], HD, 500000.0, None)
        return (ops.apply_rope(q, cos, sin)
                + ops.apply_rope(kq, cos, sin).repeat(NH // NKV, 2)).astype(q.dtype)

    t = timed_loop(rope_step, q)
    print(f"rope (cos/sin + 2 applies):            {t*1e6:7.1f} us  "
          f"-> x{L} = {t*L*1e3:.3f} ms", flush=True)

    # --- cache write (dynamic_update_slice into [B, maxT, NKV, HD]) ---
    def cache_write(kn):
        out = jax.lax.dynamic_update_slice(kc, kn, (0, ctx - 1, 0, 0))
        return kn + out[:, 0:1] * 1e-20

    t = timed_loop(cache_write, kq)
    print(f"cache write (1 of 2 per layer):        {t*1e6:7.1f} us  "
          f"-> x{2*L} = {t*2*L*1e3:.3f} ms", flush=True)

    # --- argmax over logits ---
    logits = jax.random.normal(key, (B, 1, V), jnp.bfloat16)
    t = timed_loop(
        lambda l: jnp.argmax(l[:, -1, :128256], -1).astype(jnp.int32)[:, None]
        .astype(jnp.bfloat16) + l[:, :1, :1] * 0, logits
    )
    print(f"logits argmax:                         {t*1e6:7.1f} us", flush=True)

    # --- embedding gather (wte passed as an argument: a closed-over device
    # array is baked into the jaxpr as a 525MB constant, which overflows the
    # tunnel's compile-request limit) ---
    wte = jax.random.normal(key, (128256, H), jnp.bfloat16)
    tok = jnp.zeros((B, 1), jnp.int32)

    def emb(tok, wte):
        x = jnp.take(wte, tok, axis=0)
        return (tok + (x.sum() * 1e-20).astype(jnp.int32))

    t = timed_loop(emb, tok, wte)
    print(f"embed gather:                          {t*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
