"""GELU tests (mirrors CudaGeluOpTests.cpp / Gelu.{Cpu,Cuda}.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.ops import gelu, gelu_exact, gelu_sigmoid, gelu_tanh


@pytest.mark.parametrize("variant", ["tanh", "exact", "sigmoid"])
class TestGeluVariants:
    def test_forward_reference_points(self, rng_key, variant):
        x = jax.random.normal(rng_key, (64,)) * 3
        y = gelu(x, variant)
        # All variants approximate x·Φ(x): exact at 0, ≈x for large x, ≈0 for small.
        np.testing.assert_allclose(gelu(jnp.zeros(3), variant), 0.0, atol=1e-7)
        big = jnp.array([10.0])
        np.testing.assert_allclose(gelu(big, variant), big, rtol=1e-3)
        np.testing.assert_allclose(gelu(-big, variant), 0.0, atol=1e-3)
        assert y.shape == x.shape

    def test_backward_matches_numerical(self, rng_key, variant):
        x = jax.random.normal(rng_key, (32,), dtype=jnp.float32)
        fn = {"tanh": gelu_tanh, "exact": gelu_exact, "sigmoid": gelu_sigmoid}[variant]
        g = jax.grad(lambda x: jnp.sum(fn(x)))(x)
        eps = 1e-3
        num = (fn(x + eps) - fn(x - eps)) / (2 * eps)
        np.testing.assert_allclose(g, num, rtol=1e-2, atol=1e-3)


def test_tanh_matches_jax_nn(rng_key):
    x = jax.random.normal(rng_key, (128,))
    np.testing.assert_allclose(
        gelu_tanh(x), jax.nn.gelu(x, approximate=True), rtol=1e-5, atol=1e-6
    )


def test_exact_matches_jax_nn(rng_key):
    x = jax.random.normal(rng_key, (128,))
    np.testing.assert_allclose(
        gelu_exact(x), jax.nn.gelu(x, approximate=False), rtol=1e-5, atol=1e-6
    )


def test_unknown_variant_raises():
    with pytest.raises(ValueError, match="unknown GELU"):
        gelu(jnp.zeros(3), "relu")
