"""Per-dtype op sweeps (reference pattern: FP16/BF16 variants per op —
Linear.Cuda.cpp:611-631 etc.). Each op must preserve dtype, stay finite,
and track the f32 oracle within dtype-appropriate tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu import ops

DTYPES = [
    (jnp.float32, 1e-5),
    (jnp.bfloat16, 4e-2),
    (jnp.float16, 1e-2),
]


def _cast(key, shape, dtype):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


@pytest.mark.parametrize("dtype,tol", DTYPES)
class TestDtypeSweeps:
    def test_linear(self, rng_key, dtype, tol):
        k1, k2, k3 = jax.random.split(rng_key, 3)
        x, w, b = _cast(k1, (4, 32), dtype), _cast(k2, (32, 16), dtype), _cast(k3, (16,), dtype)
        y = ops.linear(x, w, b)
        assert y.dtype == dtype
        ref = (x.astype(jnp.float32) @ w.astype(jnp.float32)) + b.astype(jnp.float32)
        np.testing.assert_allclose(
            y.astype(jnp.float32), ref, rtol=tol, atol=tol * 8
        )

    def test_gelu(self, rng_key, dtype, tol):
        x = _cast(rng_key, (64,), dtype)
        y = ops.gelu(x)
        assert y.dtype == dtype and bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))

    def test_layer_norm(self, rng_key, dtype, tol):
        x = _cast(rng_key, (8, 64), dtype)
        y = ops.layer_norm(x, jnp.ones(64, dtype), jnp.zeros(64, dtype))
        assert y.dtype == dtype
        np.testing.assert_allclose(
            y.astype(jnp.float32).mean(-1), 0.0, atol=max(tol, 1e-2)
        )

    def test_rms_norm(self, rng_key, dtype, tol):
        x = _cast(rng_key, (8, 64), dtype)
        y = ops.rms_norm(x, jnp.ones(64, dtype))
        assert y.dtype == dtype
        rms = jnp.sqrt(jnp.mean(y.astype(jnp.float32) ** 2, -1))
        np.testing.assert_allclose(rms, 1.0, rtol=max(tol, 2e-2))

    def test_softmax(self, rng_key, dtype, tol):
        x = _cast(rng_key, (4, 50), dtype)
        y = ops.softmax(x)
        assert y.dtype == dtype
        np.testing.assert_allclose(
            y.astype(jnp.float32).sum(-1), 1.0, rtol=max(tol, 1e-2)
        )

    def test_softmax_cross_entropy(self, rng_key, dtype, tol):
        k1, k2 = jax.random.split(rng_key)
        logits = _cast(k1, (8, 32), dtype)
        targets = jax.random.randint(k2, (8,), 0, 32)
        loss = ops.softmax_cross_entropy(logits, targets)
        ref = ops.softmax_cross_entropy_ref(logits.astype(jnp.float32), targets)
        np.testing.assert_allclose(loss, ref, rtol=max(tol, 1e-2), atol=1e-2)

    def test_attention(self, rng_key, dtype, tol):
        qkv = _cast(rng_key, (2, 8, 48), dtype)
        y = ops.mha_qkv(qkv, 2)
        assert y.dtype == dtype
        ref = ops.mha_qkv(qkv.astype(jnp.float32), 2)
        np.testing.assert_allclose(
            y.astype(jnp.float32), ref, rtol=max(tol, 3e-2), atol=max(tol, 3e-2)
        )

    def test_swiglu(self, rng_key, dtype, tol):
        k1, k2 = jax.random.split(rng_key)
        g, u = _cast(k1, (4, 16), dtype), _cast(k2, (4, 16), dtype)
        y = ops.swiglu(g, u)
        assert y.dtype == dtype

    def test_rope(self, rng_key, dtype, tol):
        x = _cast(rng_key, (1, 8, 2, 16), dtype)
        cos, sin = ops.rope_cos_sin(jnp.arange(8)[None], 16, dtype=jnp.float32)
        y = ops.apply_rope(x, cos, sin)
        assert y.dtype == dtype
        np.testing.assert_allclose(
            jnp.linalg.norm(y.astype(jnp.float32), axis=-1),
            jnp.linalg.norm(x.astype(jnp.float32), axis=-1),
            rtol=max(tol, 2e-2),
        )

    def test_residual(self, rng_key, dtype, tol):
        k1, k2 = jax.random.split(rng_key)
        a, b = _cast(k1, (4, 8), dtype), _cast(k2, (4, 8), dtype)
        assert ops.residual(a, b).dtype == dtype

    def test_grads_finite(self, rng_key, dtype, tol):
        """Backward through a small stack stays finite in every dtype."""
        k1, k2 = jax.random.split(rng_key)
        x = _cast(k1, (4, 32), dtype)
        w = _cast(k2, (32, 32), dtype)

        def loss(w):
            h = ops.gelu(ops.linear(x, w, None))
            h = ops.layer_norm(h, jnp.ones(32, dtype), jnp.zeros(32, dtype))
            return jnp.sum(h.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(w)
        assert g.dtype == dtype
        assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


class TestOpErrorPaths:
    def test_linear_shape_mismatch(self, rng_key):
        with pytest.raises(TypeError):
            ops.linear(jnp.zeros((2, 8)), jnp.zeros((4, 8)), None)

    def test_encoder_int_input_no_grad(self, rng_key):
        toks = jnp.zeros((1, 4), jnp.int32)
        wte = jax.random.normal(rng_key, (16, 8))
        g = jax.grad(lambda w: ops.encoder(toks, w, None).sum())(wte)
        assert g.shape == wte.shape

    def test_softmax_axis_out_of_range(self):
        with pytest.raises(Exception):
            ops.softmax(jnp.zeros((2, 3)), axis=5)
