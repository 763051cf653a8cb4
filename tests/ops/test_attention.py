"""Attention op tests (mirrors CudaMultHeadAttentionOpTests.cpp,
CpuAttentionOp causal-MHA semantics; GQA/decode are BASELINE extensions)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.ops import (
    causal_mask,
    decode_attention,
    dot_product_attention,
    mha_qkv,
)


def naive_causal_mha(qkv, num_heads):
    """Literal translation of the math in CpuAttentionOp.ixx:130-218."""
    B, T, C3 = qkv.shape
    C = C3 // 3
    HS = C // num_heads
    q, k, v = np.split(np.asarray(qkv, np.float64), 3, axis=-1)
    out = np.zeros((B, T, C))
    scale = 1.0 / math.sqrt(HS)
    for b in range(B):
        for h in range(num_heads):
            qh = q[b, :, h * HS:(h + 1) * HS]
            kh = k[b, :, h * HS:(h + 1) * HS]
            vh = v[b, :, h * HS:(h + 1) * HS]
            scores = qh @ kh.T * scale
            for i in range(T):
                row = scores[i, : i + 1]
                e = np.exp(row - row.max())
                p = e / e.sum()
                out[b, i, h * HS:(h + 1) * HS] = p @ vh[: i + 1]
    return out


class TestMhaQkv:
    @pytest.mark.parametrize("B,T,C,NH", [(2, 8, 16, 4), (1, 5, 12, 3), (3, 1, 8, 2)])
    def test_matches_naive(self, rng_key, B, T, C, NH):
        qkv = jax.random.normal(rng_key, (B, T, 3 * C))
        out = mha_qkv(qkv, NH)
        np.testing.assert_allclose(out, naive_causal_mha(qkv, NH), rtol=1e-4, atol=1e-5)

    def test_causality(self, rng_key):
        """Changing future tokens must not change earlier outputs."""
        k1, k2 = jax.random.split(rng_key)
        qkv = jax.random.normal(k1, (1, 8, 48))
        out1 = mha_qkv(qkv, 4)
        qkv2 = qkv.at[:, 5:].set(jax.random.normal(k2, (1, 3, 48)))
        out2 = mha_qkv(qkv2, 4)
        np.testing.assert_allclose(out1[:, :5], out2[:, :5], rtol=1e-5, atol=1e-6)

    def test_shape_validation(self):
        with pytest.raises(ValueError, match="divisible by 3"):
            mha_qkv(jnp.zeros((1, 4, 16)), 2)
        with pytest.raises(ValueError, match="num_heads"):
            mha_qkv(jnp.zeros((1, 4, 30)), 3)

    def test_grads_flow(self, rng_key):
        qkv = jax.random.normal(rng_key, (2, 6, 24))
        g = jax.grad(lambda q: jnp.sum(mha_qkv(q, 2) ** 2))(qkv)
        assert g.shape == qkv.shape
        assert jnp.abs(g).max() > 0


class TestGQA:
    def test_gqa_equals_repeated_kv(self, rng_key):
        k1, k2, k3 = jax.random.split(rng_key, 3)
        B, T, NH, NKV, HS = 2, 8, 8, 2, 16
        q = jax.random.normal(k1, (B, T, NH, HS))
        k = jax.random.normal(k2, (B, T, NKV, HS))
        v = jax.random.normal(k3, (B, T, NKV, HS))
        out = dot_product_attention(q, k, v, causal=True)
        # Oracle: repeat kv heads to NH and run MHA.
        k_rep = jnp.repeat(k, NH // NKV, axis=2)
        v_rep = jnp.repeat(v, NH // NKV, axis=2)
        ref = dot_product_attention(q, k_rep, v_rep, causal=True)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_invalid_head_ratio(self, rng_key):
        q = jnp.zeros((1, 4, 6, 8))
        k = v = jnp.zeros((1, 4, 4, 8))
        with pytest.raises(ValueError, match="divisible"):
            dot_product_attention(q, k, v)

    def test_non_causal(self, rng_key):
        k1, k2, k3 = jax.random.split(rng_key, 3)
        q = jax.random.normal(k1, (1, 4, 2, 8))
        k = jax.random.normal(k2, (1, 4, 2, 8))
        v = jax.random.normal(k3, (1, 4, 2, 8))
        out = dot_product_attention(q, k, v, causal=False)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(8)
        ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(scores, axis=-1), v)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


class TestDecodeAttention:
    def test_matches_full_attention_last_step(self, rng_key):
        """Decode over a cache == last row of full causal attention."""
        k1, k2, k3 = jax.random.split(rng_key, 3)
        B, T, NH, HS = 2, 9, 4, 8
        q_all = jax.random.normal(k1, (B, T, NH, HS))
        k_all = jax.random.normal(k2, (B, T, NH, HS))
        v_all = jax.random.normal(k3, (B, T, NH, HS))
        full = dot_product_attention(q_all, k_all, v_all, causal=True)

        maxT = 16
        k_cache = jnp.zeros((B, maxT, NH, HS)).at[:, :T].set(k_all)
        v_cache = jnp.zeros((B, maxT, NH, HS)).at[:, :T].set(v_all)
        dec = decode_attention(
            q_all[:, T - 1:T], k_cache, v_cache, jnp.full((B,), T, jnp.int32)
        )
        np.testing.assert_allclose(dec[:, 0], full[:, T - 1], rtol=1e-4, atol=1e-5)

    def test_kv_offset_matches_decode(self, rng_key):
        k1, k2, k3 = jax.random.split(rng_key, 3)
        B, T, NH, HS = 1, 6, 2, 4
        q_all = jax.random.normal(k1, (B, T, NH, HS))
        k_all = jax.random.normal(k2, (B, T, NH, HS))
        v_all = jax.random.normal(k3, (B, T, NH, HS))
        # One-step query at position T-1 via kv_offset.
        out = dot_product_attention(
            q_all[:, T - 1:T], k_all, v_all, causal=True, kv_offset=T - 1
        )
        full = dot_product_attention(q_all, k_all, v_all, causal=True)
        np.testing.assert_allclose(out[:, 0], full[:, T - 1], rtol=1e-5, atol=1e-5)


def test_causal_mask_basic():
    m = causal_mask(3, 3)
    expected = np.array(
        [[True, False, False], [True, True, False], [True, True, True]]
    )
    np.testing.assert_array_equal(m, expected)
    m_off = causal_mask(1, 4, offset=2)
    np.testing.assert_array_equal(m_off, [[True, True, True, False]])
