"""Flash-attention Pallas kernel vs jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.kernels.flash_attention import flash_attention, flash_mha_qkv
from mila_tpu.ops import dot_product_attention, mha_qkv


def _qkv(key, B, T, NH, D, NKV=None, dtype=jnp.float32):
    NKV = NKV or NH
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, T, NH, D), dtype=jnp.float32).astype(dtype)
    k = jax.random.normal(k2, (B, T, NKV, D), dtype=jnp.float32).astype(dtype)
    v = jax.random.normal(k3, (B, T, NKV, D), dtype=jnp.float32).astype(dtype)
    return q, k, v


class TestFlashAttentionKernel:
    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_reference(self, rng_key, causal):
        q, k, v = _qkv(rng_key, 2, 256, 2, 128)
        out = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
        ref = dot_product_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    def test_gqa(self, rng_key):
        q, k, v = _qkv(rng_key, 1, 256, 4, 128, NKV=2)
        out = flash_attention(q, k, v, causal=True)
        ref = dot_product_attention(q, k, v, causal=True)
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    def test_multi_kv_tiles_online_softmax(self, rng_key):
        """T=512 with block_k=128 → 4 KV tiles: exercises the running
        max/sum correction across tiles."""
        q, k, v = _qkv(rng_key, 1, 512, 1, 128)
        out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
        ref = dot_product_attention(q, k, v, causal=True)
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    def test_extreme_logits_stable(self, rng_key):
        q, k, v = _qkv(rng_key, 1, 256, 1, 128)
        q = q * 30.0  # large scores stress the online softmax
        out = flash_attention(q, k, v, causal=True)
        ref = dot_product_attention(q, k, v, causal=True)
        assert bool(jnp.all(jnp.isfinite(out)))
        np.testing.assert_allclose(out, ref, rtol=5e-3, atol=5e-3)

    def test_small_shape_fallback(self, rng_key):
        """Shapes below tile minimums route to the jnp reference."""
        q, k, v = _qkv(rng_key, 2, 12, 2, 16)
        out = flash_attention(q, k, v, causal=True)
        ref = dot_product_attention(q, k, v, causal=True)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_kv_offset_decode_window(self, rng_key):
        """Tq < Tkv with kv_offset (chunked prefill shape)."""
        k1, k2 = jax.random.split(rng_key)
        q_full, k, v = _qkv(k1, 1, 256, 2, 128)
        q = q_full[:, 128:]  # second half queries
        out = flash_attention(q, k, v, causal=True, kv_offset=128)
        ref = dot_product_attention(q, k, v, causal=True, kv_offset=128)
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    def test_bf16(self, rng_key):
        q, k, v = _qkv(rng_key, 1, 256, 2, 128, dtype=jnp.bfloat16)
        out = flash_attention(q, k, v, causal=True)
        assert out.dtype == jnp.bfloat16
        ref = dot_product_attention(q, k, v, causal=True)
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref.astype(jnp.float32), rtol=3e-2, atol=3e-2
        )

    def test_grads_match_reference(self, rng_key):
        q, k, v = _qkv(rng_key, 1, 128, 2, 128)
        ct = jax.random.normal(rng_key, q.shape)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, causal=True) * ct)

        def loss_ref(q, k, v):
            return jnp.sum(dot_product_attention(q, k, v, causal=True) * ct)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)

    def test_grads_match_reference_kv_offset(self, rng_key):
        """Chunked-prefill backward: Pallas kernels with shifted causal mask."""
        offset = 128
        q = jax.random.normal(rng_key, (1, 128, 2, 128))
        k_all = jax.random.normal(jax.random.fold_in(rng_key, 1), (1, 256, 2, 128))
        v_all = jax.random.normal(jax.random.fold_in(rng_key, 2), (1, 256, 2, 128))
        ct = jax.random.normal(jax.random.fold_in(rng_key, 3), q.shape)

        def loss_flash(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, causal=True, kv_offset=offset) * ct
            )

        def loss_ref(q, k, v):
            return jnp.sum(
                dot_product_attention(q, k, v, causal=True, kv_offset=offset) * ct
            )

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k_all, v_all)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k_all, v_all)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)

    @pytest.mark.parametrize("causal", [True, False])
    def test_head_dim_64_transposed_layout(self, rng_key, causal):
        """D < 128 routes through the transposed-PV kernel (llama head_dim)."""
        q, k, v = _qkv(rng_key, 2, 256, 4, 64, NKV=2)
        out = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
        ref = dot_product_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    def test_head_dim_64_multi_tile_stats(self, rng_key):
        """Online-softmax correction across 4 KV tiles in the transposed
        layout, plus extreme logits."""
        q, k, v = _qkv(rng_key, 1, 512, 2, 64)
        q = q * 20.0
        out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
        ref = dot_product_attention(q, k, v, causal=True)
        assert bool(jnp.all(jnp.isfinite(out)))
        np.testing.assert_allclose(out, ref, rtol=5e-3, atol=5e-3)

    def test_head_dim_64_grads(self, rng_key):
        """Backward consumes the transposed forward's l/m stats (col 0)."""
        q, k, v = _qkv(rng_key, 1, 256, 2, 64)
        ct = jax.random.normal(rng_key, q.shape)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, causal=True,
                                           block_q=128, block_k=128) * ct)

        def loss_ref(q, k, v):
            return jnp.sum(dot_product_attention(q, k, v, causal=True) * ct)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)

    @pytest.mark.parametrize("offset", [0, 128])
    def test_grads_bf16(self, rng_key, offset):
        """bf16 backward parity: the Pallas bwd kernels run QK^T/PV and ds/p
        dots on native-dtype inputs (standard flash practice), so bf16 is a
        distinct numeric path from the f32 tests above."""
        Tq, Tkv = 128, 128 + offset
        q = jax.random.normal(rng_key, (1, Tq, 2, 128)).astype(jnp.bfloat16)
        k = jax.random.normal(
            jax.random.fold_in(rng_key, 1), (1, Tkv, 2, 128)
        ).astype(jnp.bfloat16)
        v = jax.random.normal(
            jax.random.fold_in(rng_key, 2), (1, Tkv, 2, 128)
        ).astype(jnp.bfloat16)
        ct = jax.random.normal(jax.random.fold_in(rng_key, 3), q.shape)

        def loss_flash(q, k, v):
            out = flash_attention(q, k, v, causal=True, kv_offset=offset)
            return jnp.sum(out.astype(jnp.float32) * ct)

        def loss_ref(q, k, v):
            out = dot_product_attention(q, k, v, causal=True, kv_offset=offset)
            return jnp.sum(out.astype(jnp.float32) * ct)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                a.astype(jnp.float32), b.astype(jnp.float32),
                rtol=2e-2, atol=2e-2,
            )

    def test_fused_qkv_wrapper(self, rng_key):
        qkv = jax.random.normal(rng_key, (2, 256, 3 * 256))
        out = flash_mha_qkv(qkv, 2)
        ref = mha_qkv(qkv, 2)
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    def test_jit_compiles(self, rng_key):
        q, k, v = _qkv(rng_key, 1, 128, 1, 128)
        f = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))
        np.testing.assert_allclose(
            f(q, k, v), flash_attention(q, k, v, causal=True), rtol=1e-5, atol=1e-5
        )
