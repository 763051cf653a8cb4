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
