"""LayerNorm / RMSNorm tests (mirrors CudaLayerNormOpTests.cpp,
LayerNorm.{Cpu,Cuda}.cpp; RMSNorm is a BASELINE extension)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.ops import layer_norm, layer_norm_ref, rms_norm, rms_norm_ref


class TestLayerNorm:
    @pytest.mark.parametrize("shape", [(4, 16), (2, 3, 32), (1, 1, 8)])
    def test_forward(self, rng_key, shape):
        k1, k2, k3 = jax.random.split(rng_key, 3)
        x = jax.random.normal(k1, shape) * 2 + 1
        gamma = jax.random.normal(k2, shape[-1:]) + 1
        beta = jax.random.normal(k3, shape[-1:])
        np.testing.assert_allclose(
            layer_norm(x, gamma, beta), layer_norm_ref(x, gamma, beta), rtol=1e-5, atol=1e-5
        )

    def test_output_normalized(self, rng_key):
        x = jax.random.normal(rng_key, (8, 64)) * 5 + 3
        y = layer_norm(x, jnp.ones(64), jnp.zeros(64))
        np.testing.assert_allclose(y.mean(axis=-1), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.std(axis=-1), 1.0, rtol=1e-2)

    def test_backward_matches_autodiff(self, rng_key):
        k1, k2, k3, k4 = jax.random.split(rng_key, 4)
        x = jax.random.normal(k1, (4, 8, 32))
        gamma = jax.random.normal(k2, (32,)) + 1
        beta = jax.random.normal(k3, (32,))
        ct = jax.random.normal(k4, (4, 8, 32))

        gm = jax.grad(lambda *a: jnp.sum(layer_norm(*a) * ct), argnums=(0, 1, 2))(
            x, gamma, beta
        )
        ga = jax.grad(lambda *a: jnp.sum(layer_norm_ref(*a) * ct), argnums=(0, 1, 2))(
            x, gamma, beta
        )
        for m, a in zip(gm, ga):
            np.testing.assert_allclose(m, a, rtol=1e-4, atol=1e-4)

    def test_bf16_stats_in_f32(self, rng_key):
        x = (jax.random.normal(rng_key, (8, 128)) * 3).astype(jnp.bfloat16)
        y = layer_norm(x, jnp.ones(128, jnp.bfloat16), jnp.zeros(128, jnp.bfloat16))
        assert y.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            y.astype(jnp.float32).mean(axis=-1), 0.0, atol=2e-2
        )


class TestRMSNorm:
    def test_forward(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        x = jax.random.normal(k1, (4, 64))
        gamma = jax.random.normal(k2, (64,)) + 1
        np.testing.assert_allclose(
            rms_norm(x, gamma), rms_norm_ref(x, gamma), rtol=1e-5, atol=1e-5
        )

    def test_unit_rms(self, rng_key):
        x = jax.random.normal(rng_key, (8, 64)) * 7
        y = rms_norm(x, jnp.ones(64))
        rms = jnp.sqrt(jnp.mean(y * y, axis=-1))
        np.testing.assert_allclose(rms, 1.0, rtol=1e-3)

    def test_backward_matches_autodiff(self, rng_key):
        k1, k2, k3 = jax.random.split(rng_key, 3)
        x = jax.random.normal(k1, (4, 8, 32))
        gamma = jax.random.normal(k2, (32,)) + 1
        ct = jax.random.normal(k3, (4, 8, 32))
        gm = jax.grad(lambda *a: jnp.sum(rms_norm(*a) * ct), argnums=(0, 1))(x, gamma)
        ga = jax.grad(lambda *a: jnp.sum(rms_norm_ref(*a) * ct), argnums=(0, 1))(x, gamma)
        for m, a in zip(gm, ga):
            np.testing.assert_allclose(m, a, rtol=1e-4, atol=1e-4)
