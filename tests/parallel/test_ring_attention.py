"""Ring attention vs full attention on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.ops import dot_product_attention
from mila_tpu.parallel import make_mesh
from mila_tpu.parallel.ring_attention import ring_attention


def _qkv(key, B, T, NH, D, NKV=None):
    NKV = NKV or NH
    ks = jax.random.split(key, 3)
    return (
        jax.random.normal(ks[0], (B, T, NH, D)),
        jax.random.normal(ks[1], (B, T, NKV, D)),
        jax.random.normal(ks[2], (B, T, NKV, D)),
    )


class TestRingAttention:
    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_full_attention(self, rng_key, causal):
        mesh = make_mesh(data=8, model=1)
        q, k, v = _qkv(rng_key, 2, 64, 4, 16)
        out = ring_attention(q, k, v, mesh, causal=causal)
        ref = dot_product_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_gqa(self, rng_key):
        mesh = make_mesh(data=8, model=1)
        q, k, v = _qkv(rng_key, 1, 64, 8, 16, NKV=2)
        out = ring_attention(q, k, v, mesh, causal=True)
        ref = dot_product_attention(q, k, v, causal=True)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_four_way_ring(self, rng_key):
        mesh = make_mesh(data=4, model=2)
        q, k, v = _qkv(rng_key, 2, 32, 2, 8)
        out = ring_attention(q, k, v, mesh, seq_axis="data", causal=True)
        ref = dot_product_attention(q, k, v, causal=True)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_jit_under_mesh(self, rng_key):
        mesh = make_mesh(data=8, model=1)
        q, k, v = _qkv(rng_key, 1, 64, 2, 16)
        f = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh, causal=True))
        np.testing.assert_allclose(
            f(q, k, v), dot_product_attention(q, k, v, causal=True),
            rtol=2e-4, atol=2e-5,
        )
