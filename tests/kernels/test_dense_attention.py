"""Dense decode attention wrapper: shape/mask logic vs ops.decode_attention.

On CPU the kernel body can't run (manual DMA/semaphores need hardware), so
the wrapper routes to the oracle — these tests lock the layout contract
([B, NKV, T, HD] head-major) and ragged-length masking. The compiled kernel
is checked on-chip against the same oracle by ``bench.py --what kernel_check``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mila_tpu.kernels.dense_attention import dense_decode_attention
from mila_tpu.ops.attention import decode_attention


def _case(B=3, NKV=2, NH=8, T=64, HD=32, seed=0):
    key = jax.random.key(seed)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, 1, NH, HD), jnp.float32)
    k = jax.random.normal(ks[1], (B, NKV, T, HD), jnp.float32)
    v = jax.random.normal(ks[2], (B, NKV, T, HD), jnp.float32)
    return q, k, v


def test_matches_oracle_ragged():
    q, k, v = _case()
    lens = jnp.array([1, 17, 64], jnp.int32)
    got = dense_decode_attention(q, k, v, lens)
    want = decode_attention(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), lens
    )
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
