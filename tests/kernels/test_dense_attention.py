"""Dense decode attention wrapper: shape/mask logic vs ops.decode_attention.

On CPU the kernel body can't run (manual DMA/semaphores need hardware), so
the wrapper routes to the oracle — these tests lock the layout contract
([B, T, NKV, HD] token-major, the cache write layout) and ragged-length
masking, plus the lane-packed query construction the hardware kernel
contracts over. The compiled kernel is checked on-chip against the same
oracle by ``bench.py --what kernel_check``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mila_tpu.kernels.dense_attention import (
    dense_decode_attention,
    pack_queries,
)
from mila_tpu.ops.attention import decode_attention


def _case(B=3, NKV=2, NH=8, T=64, HD=32, seed=0):
    key = jax.random.key(seed)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, 1, NH, HD), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, NKV, HD), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, NKV, HD), jnp.float32)
    return q, k, v


def test_matches_oracle_ragged():
    q, k, v = _case()
    lens = jnp.array([1, 17, 64], jnp.int32)
    got = dense_decode_attention(q, k, v, lens)
    want = decode_attention(q, k, v, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_3d_query_shape():
    q, k, v = _case()
    lens = jnp.array([8, 8, 8], jnp.int32)
    got = dense_decode_attention(q[:, 0], k, v, lens)
    assert got.shape == (3, 8, 32)
    want = dense_decode_attention(q, k, v, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want[:, 0]),
                               rtol=1e-6, atol=1e-6)


def test_pack_queries_contract():
    """q_pk @ packed-kv rows == per-head q @ k: the zero lanes kill foreign
    heads' contributions (the GQA trick the hardware kernel relies on)."""
    B, NH, NKV, HD, T = 2, 8, 2, 16, 8
    G = NH // NKV
    key = jax.random.key(3)
    q = jax.random.normal(key, (B, NH, HD), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, T, NKV, HD))
    q_pk = pack_queries(q, NKV)
    assert q_pk.shape == (B, NH, NKV * HD)
    k2 = k.reshape(B, T, NKV * HD)
    s_pk = jnp.einsum("bnc,btc->bnt", q_pk, k2)
    # reference built directly: head n attends kv head n // G
    s_direct = jnp.stack(
        [jnp.einsum("bd,btd->bt", q[:, n], k[:, :, n // G])
         for n in range(NH)], axis=1)
    np.testing.assert_allclose(np.asarray(s_pk), np.asarray(s_direct),
                               rtol=1e-5, atol=1e-5)


def test_fused_ref_matches_rope_plus_oracle():
    """_fused_decode_attention_ref (the CPU path of fused_decode_attention)
    vs an independently assembled oracle: rope the q/k halves via
    ops.apply_rope, insert the new token, then ops.decode_attention
    (advisor r3 finding #2 — the default decode path's oracle itself needs
    independent coverage)."""
    from mila_tpu.kernels.dense_attention import fused_decode_attention
    from mila_tpu.ops.rope import apply_rope

    B, NKV, NH, T, HD = 3, 2, 8, 64, 32
    KD, NQ = NKV * HD, NH * HD
    key = jax.random.key(7)
    qkv = jax.random.normal(key, (B, NQ + 2 * KD), jnp.float32)
    kc = jax.random.normal(jax.random.fold_in(key, 1), (B, T, NKV, HD))
    vc = jax.random.normal(jax.random.fold_in(key, 2), (B, T, NKV, HD))
    old_lens = jnp.array([0, 17, 63], jnp.int32)

    # Tiled tables as the model builds them (llama.py _backbone_fused_decode)
    d2 = HD // 2
    inv = 1.0 / (10000.0 ** (jnp.arange(d2, dtype=jnp.float32) / d2))
    ang = old_lens[:, None].astype(jnp.float32) * inv[None]
    c2, s2 = jnp.cos(ang), jnp.sin(ang)
    cos_t = jnp.tile(jnp.concatenate([c2, c2], -1), (1, NKV))
    sin_t = jnp.tile(jnp.concatenate([-s2, s2], -1), (1, NKV))

    att, k_new, kc_out, vc_out = fused_decode_attention(
        qkv, None, cos_t, sin_t, kc, vc, old_lens, num_heads=NH,
        interpret=True)

    # Independent oracle via ops.apply_rope (cos/sin are [B, T=1, d/2]).
    q = apply_rope(qkv[:, :NQ].reshape(B, 1, NH, HD), c2[:, None], s2[:, None])
    kn = apply_rope(qkv[:, NQ:NQ + KD].reshape(B, 1, NKV, HD),
                    c2[:, None], s2[:, None])
    vn = qkv[:, NQ + KD:].reshape(B, 1, NKV, HD)
    rows = jnp.arange(B)
    kc2 = kc.at[rows, old_lens].set(kn[:, 0])
    vc2 = vc.at[rows, old_lens].set(vn[:, 0])
    want = decode_attention(q, kc2, vc2, old_lens + 1)
    np.testing.assert_allclose(np.asarray(att), np.asarray(want[:, 0]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(k_new),
                               np.asarray(kn[:, 0].reshape(B, KD)),
                               rtol=2e-5, atol=2e-5)
