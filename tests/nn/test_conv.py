"""Conv2D / pooling / CNN classifier tests (ROADMAP CNN-MNIST parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.models.cnn_classifier import CNNClassifier, CNNClassifierConfig
from mila_tpu.nn import Conv2D, Conv2DConfig, Flatten, Pool2D, Pool2DConfig
from mila_tpu.ops import avg_pool2d, conv2d, max_pool2d


class TestConvOps:
    def test_identity_kernel(self):
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        w = jnp.zeros((3, 3, 1, 1)).at[1, 1, 0, 0].set(1.0)
        np.testing.assert_allclose(conv2d(x, w), x, rtol=1e-6)

    def test_matches_manual_valid_conv(self, rng_key):
        x = jax.random.normal(rng_key, (1, 5, 5, 1))
        w = jax.random.normal(jax.random.fold_in(rng_key, 1), (3, 3, 1, 1))
        y = conv2d(x, w, padding="VALID")
        assert y.shape == (1, 3, 3, 1)
        # VALID output (i, j) correlates the window starting at (i, j).
        manual = sum(
            float(x[0, 1 + di, 1 + dj, 0]) * float(w[di, dj, 0, 0])
            for di in range(3) for dj in range(3)
        )
        np.testing.assert_allclose(float(y[0, 1, 1, 0]), manual, rtol=1e-4)

    def test_bias_and_stride(self, rng_key):
        x = jax.random.normal(rng_key, (2, 8, 8, 3))
        w = jax.random.normal(rng_key, (3, 3, 3, 16))
        b = jnp.ones(16)
        y = conv2d(x, w, b, stride=2)
        assert y.shape == (2, 4, 4, 16)

    def test_pools(self):
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        mp = max_pool2d(x, 2)
        ap = avg_pool2d(x, 2)
        assert mp.shape == (1, 2, 2, 1)
        assert float(mp[0, 0, 0, 0]) == 5.0  # max of [[0,1],[4,5]]
        assert float(ap[0, 0, 0, 0]) == 2.5


class TestConvLayer:
    def test_init_and_shapes(self, rng_key):
        layer = Conv2D(Conv2DConfig(in_channels=1, out_channels=8))
        p = layer.init(rng_key, (2, 28, 28, 1))
        assert p["weight"].shape == (3, 3, 1, 8)
        y = layer.apply(p, jnp.zeros((2, 28, 28, 1)))
        assert y.shape == (2, 28, 28, 8)
        assert layer.output_shape((2, 28, 28, 1)) == (2, 28, 28, 8)

    def test_channel_mismatch(self, rng_key):
        layer = Conv2D(Conv2DConfig(in_channels=3, out_channels=8))
        with pytest.raises(ValueError, match="channels"):
            layer.init(rng_key, (1, 8, 8, 1))

    def test_pool_flatten_shapes(self):
        pool = Pool2D(Pool2DConfig(window=2))
        assert pool.output_shape((1, 28, 28, 8)) == (1, 14, 14, 8)
        assert Flatten().output_shape((2, 14, 14, 8)) == (2, 14 * 14 * 8)


class TestCNNClassifier:
    def test_forward_from_flat_input(self, rng_key):
        model = CNNClassifier(CNNClassifierConfig(conv_channels=(8, 16), hidden_dim=32))
        p = model.init(rng_key, (4, 784))
        y = model.apply(p, jax.random.normal(rng_key, (4, 784)))
        assert y.shape == (4, 10)

    def test_learns_synthetic_digits(self, rng_key):
        """Few steps of training must cut the loss sharply (full accuracy
        run lives in the examples; this is the fast integration check)."""
        from mila_tpu.data import synthetic_mnist
        from mila_tpu.ops import softmax_cross_entropy
        from mila_tpu.optim import AdamW, AdamWConfig

        model = CNNClassifier(CNNClassifierConfig(conv_channels=(8,), hidden_dim=32))
        params = model.init(rng_key, (32, 784))
        opt = AdamW(AdamWConfig(learning_rate=2e-3))
        state = opt.init(params)
        x_np, y_np = synthetic_mnist(n=256, seed=0)
        x, y = jnp.asarray(x_np), jnp.asarray(y_np)

        @jax.jit
        def step(params, state):
            loss, g = jax.value_and_grad(
                lambda p: softmax_cross_entropy(model.apply(p, x), y).mean()
            )(params)
            p2, s2 = opt.step(state, params, g)
            return p2, s2, loss

        params, state, l0 = step(params, state)
        for _ in range(20):
            params, state, loss = step(params, state)
        assert float(loss) < float(l0) * 0.5
