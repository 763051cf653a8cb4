"""Encoder (embedding) + residual op tests (mirrors CudaEncoderOpTests.cpp,
CudaResidualOpTests.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from mila_tpu.ops import embedding_lookup, encoder, residual


class TestEncoder:
    def test_forward_wte_plus_wpe(self, rng_key):
        k1, k2, k3 = jax.random.split(rng_key, 3)
        V, C, maxT, B, T = 50, 16, 32, 2, 8
        wte = jax.random.normal(k1, (V, C))
        wpe = jax.random.normal(k2, (maxT, C))
        tokens = jax.random.randint(k3, (B, T), 0, V)
        out = encoder(tokens, wte, wpe)
        expected = np.asarray(wte)[np.asarray(tokens)] + np.asarray(wpe)[:T][None]
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_forward_no_wpe(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        wte = jax.random.normal(k1, (10, 4))
        tokens = jax.random.randint(k2, (3, 5), 0, 10)
        np.testing.assert_allclose(
            encoder(tokens, wte, None), embedding_lookup(tokens, wte), rtol=1e-6
        )

    def test_backward_scatter_add(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        V, C = 7, 4
        wte = jax.random.normal(k1, (V, C))
        wpe = jax.random.normal(k2, (6, C))
        tokens = jnp.array([[0, 3, 3, 1]])

        def loss(wte, wpe):
            return jnp.sum(encoder(tokens, wte, wpe) ** 2)

        dm = jax.grad(loss, argnums=(0, 1))(wte, wpe)

        def loss_ref(wte, wpe):
            x = jnp.take(wte, tokens, axis=0) + wpe[:4][None]
            return jnp.sum(x**2)

        da = jax.grad(loss_ref, argnums=(0, 1))(wte, wpe)
        np.testing.assert_allclose(dm[0], da[0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(dm[1], da[1], rtol=1e-5, atol=1e-6)
        # Repeated token 3 accumulates: grad row must be nonzero there, zero at unused rows.
        assert np.abs(np.asarray(dm[0][3])).max() > 0
        np.testing.assert_allclose(dm[0][5], 0.0, atol=1e-7)


class TestResidual:
    def test_forward(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        a = jax.random.normal(k1, (4, 8))
        b = jax.random.normal(k2, (4, 8))
        np.testing.assert_allclose(residual(a, b), a + b, rtol=1e-6)

    def test_backward_passes_grad_to_both(self, rng_key):
        k1, k2, k3 = jax.random.split(rng_key, 3)
        a = jax.random.normal(k1, (4, 8))
        b = jax.random.normal(k2, (4, 8))
        ct = jax.random.normal(k3, (4, 8))
        da, db = jax.grad(lambda a, b: jnp.sum(residual(a, b) * ct), argnums=(0, 1))(a, b)
        np.testing.assert_allclose(da, ct, rtol=1e-6)
        np.testing.assert_allclose(db, ct, rtol=1e-6)
