"""Softmax + fused softmax-CE tests (mirrors CudaSoftmaxOpTests.cpp,
SoftmaxCrossEntropy.Cuda.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.ops import (
    cross_entropy_from_probs,
    log_softmax,
    softmax,
    softmax_cross_entropy,
    softmax_cross_entropy_ref,
)


class TestSoftmax:
    @pytest.mark.parametrize("axis", [-1, 0, 1])
    def test_any_axis(self, rng_key, axis):
        x = jax.random.normal(rng_key, (4, 6, 8))
        np.testing.assert_allclose(
            softmax(x, axis), jax.nn.softmax(x, axis=axis), rtol=1e-5, atol=1e-6
        )

    def test_rows_sum_to_one(self, rng_key):
        x = jax.random.normal(rng_key, (16, 50)) * 10
        np.testing.assert_allclose(softmax(x).sum(axis=-1), 1.0, rtol=1e-5)

    def test_numerical_stability(self):
        x = jnp.array([[1e4, 1e4 + 1, 1e4 - 1]])
        y = softmax(x)
        assert jnp.all(jnp.isfinite(y))
        np.testing.assert_allclose(y.sum(), 1.0, rtol=1e-5)

    def test_backward_matches_autodiff(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        x = jax.random.normal(k1, (4, 10))
        ct = jax.random.normal(k2, (4, 10))
        gm = jax.grad(lambda x: jnp.sum(softmax(x) * ct))(x)
        ga = jax.grad(lambda x: jnp.sum(jax.nn.softmax(x) * ct))(x)
        np.testing.assert_allclose(gm, ga, rtol=1e-4, atol=1e-5)

    def test_log_softmax(self, rng_key):
        x = jax.random.normal(rng_key, (4, 10))
        np.testing.assert_allclose(
            log_softmax(x), jax.nn.log_softmax(x), rtol=1e-5, atol=1e-6
        )


class TestSoftmaxCrossEntropy:
    def test_forward_matches_ref(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        logits = jax.random.normal(k1, (8, 12, 50))
        targets = jax.random.randint(k2, (8, 12), 0, 50)
        np.testing.assert_allclose(
            softmax_cross_entropy(logits, targets),
            softmax_cross_entropy_ref(logits, targets),
            rtol=1e-5,
            atol=1e-6,
        )

    def test_uniform_logits_give_log_v(self):
        V = 32
        logits = jnp.zeros((4, V))
        targets = jnp.array([0, 5, 17, 31])
        np.testing.assert_allclose(
            softmax_cross_entropy(logits, targets), np.log(V), rtol=1e-5
        )

    def test_ignore_index(self, rng_key):
        logits = jax.random.normal(rng_key, (4, 10))
        targets = jnp.array([1, -100, 3, -100])
        loss = softmax_cross_entropy(logits, targets)
        assert loss[1] == 0.0 and loss[3] == 0.0
        assert loss[0] > 0.0

    def test_backward_is_softmax_minus_onehot(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        logits = jax.random.normal(k1, (6, 20))
        targets = jax.random.randint(k2, (6,), 0, 20)
        dlogits = jax.grad(lambda l: softmax_cross_entropy(l, targets).sum())(logits)
        expected = jax.nn.softmax(logits) - jax.nn.one_hot(targets, 20)
        np.testing.assert_allclose(dlogits, expected, rtol=1e-4, atol=1e-5)

    def test_backward_ignore_index_zero_grad(self, rng_key):
        logits = jax.random.normal(rng_key, (4, 10))
        targets = jnp.array([1, -100, 3, 7])
        dlogits = jax.grad(lambda l: softmax_cross_entropy(l, targets).sum())(logits)
        np.testing.assert_allclose(dlogits[1], 0.0, atol=1e-7)
        assert np.abs(np.asarray(dlogits[0])).max() > 0

    def test_backward_matches_autodiff_ref(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        logits = jax.random.normal(k1, (8, 30))
        targets = jax.random.randint(k2, (8,), 0, 30)
        gm = jax.grad(lambda l: softmax_cross_entropy(l, targets).mean())(logits)
        ga = jax.grad(lambda l: softmax_cross_entropy_ref(l, targets).mean())(logits)
        np.testing.assert_allclose(gm, ga, rtol=1e-4, atol=1e-6)

    def test_plain_ce_from_probs(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        logits = jax.random.normal(k1, (5, 11))
        targets = jax.random.randint(k2, (5,), 0, 11)
        probs = jax.nn.softmax(logits)
        np.testing.assert_allclose(
            cross_entropy_from_probs(probs, targets),
            softmax_cross_entropy(logits, targets),
            rtol=1e-4,
            atol=1e-5,
        )
