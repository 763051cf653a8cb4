"""Linear op tests.

Mirrors reference ``Tests/Dnn/Compute/Devices/Cuda/Operations/CudaMatMulBiasOpTests.cpp``
and ``Tests/Dnn/Components/Layers/Linear.{Cpu,Cuda}.cpp`` (oracle pattern:
manual-VJP op vs autodiff reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.ops import linear, linear_ref


def _rand(key, *shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)


class TestLinearForward:
    @pytest.mark.parametrize(
        "batch_shape,fin,fout",
        [((4,), 8, 16), ((2, 3), 32, 8), ((1,), 1, 1), ((2, 5, 7), 16, 24)],
    )
    def test_matches_reference(self, rng_key, batch_shape, fin, fout):
        k1, k2, k3 = jax.random.split(rng_key, 3)
        x = _rand(k1, *batch_shape, fin)
        w = _rand(k2, fin, fout)
        b = _rand(k3, fout)
        np.testing.assert_allclose(linear(x, w, b), linear_ref(x, w, b), rtol=1e-5, atol=1e-5)

    def test_no_bias(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        x = _rand(k1, 4, 8)
        w = _rand(k2, 8, 16)
        np.testing.assert_allclose(linear(x, w, None), x @ w, rtol=1e-5, atol=1e-5)

    def test_bf16_accumulates_f32(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        x = _rand(k1, 16, 256, dtype=jnp.bfloat16)
        w = _rand(k2, 256, 32, dtype=jnp.bfloat16)
        y = linear(x, w, None)
        assert y.dtype == jnp.bfloat16
        ref = jnp.matmul(x.astype(jnp.float32), w.astype(jnp.float32))
        np.testing.assert_allclose(
            y.astype(jnp.float32), ref, rtol=5e-2, atol=5e-2
        )


class TestLinearBackward:
    def test_grads_match_autodiff(self, rng_key):
        k1, k2, k3, k4 = jax.random.split(rng_key, 4)
        x = _rand(k1, 4, 6, 8)
        w = _rand(k2, 8, 16)
        b = _rand(k3, 16)
        ct = _rand(k4, 4, 6, 16)

        def loss_manual(x, w, b):
            return jnp.sum(linear(x, w, b) * ct)

        def loss_auto(x, w, b):
            return jnp.sum(linear_ref(x, w, b) * ct)

        gm = jax.grad(loss_manual, argnums=(0, 1, 2))(x, w, b)
        ga = jax.grad(loss_auto, argnums=(0, 1, 2))(x, w, b)
        for m, a in zip(gm, ga):
            np.testing.assert_allclose(m, a, rtol=1e-4, atol=1e-4)

    def test_grad_no_bias(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        x = _rand(k1, 4, 8)
        w = _rand(k2, 8, 16)
        gm = jax.grad(lambda x, w: jnp.sum(linear(x, w, None)), argnums=(0, 1))(x, w)
        ga = jax.grad(lambda x, w: jnp.sum(x @ w), argnums=(0, 1))(x, w)
        for m, a in zip(gm, ga):
            np.testing.assert_allclose(m, a, rtol=1e-4, atol=1e-4)

    def test_jittable(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        x = _rand(k1, 4, 8)
        w = _rand(k2, 8, 16)
        y = jax.jit(linear)(x, w, None)
        np.testing.assert_allclose(y, x @ w, rtol=1e-5, atol=1e-5)
