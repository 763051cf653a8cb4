"""Layer/component tests (mirrors reference Tests/Dnn/Components/*:
lifecycle, shape validation, forward across shapes, error paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu import ops
from mila_tpu.nn import (
    Attention,
    AttentionConfig,
    Dropout,
    DropoutConfig,
    Encoder,
    EncoderConfig,
    Gelu,
    GeluConfig,
    LayerNorm,
    LayerNormConfig,
    Linear,
    LinearConfig,
    Residual,
    RMSNorm,
    Sequential,
    Softmax,
    SoftmaxCrossEntropy,
)
from mila_tpu.utils.config import ConfigError


class TestLinearLayer:
    def test_init_shapes_and_forward(self, rng_key):
        layer = Linear(LinearConfig(name="fc", in_features=8, out_features=16))
        p = layer.init(rng_key, (4, 8))
        assert p["weight"].shape == (8, 16) and p["bias"].shape == (16,)
        x = jax.random.normal(rng_key, (4, 8))
        y = layer.apply(p, x)
        assert y.shape == (4, 16)
        np.testing.assert_allclose(y, ops.linear(x, p["weight"], p["bias"]), rtol=1e-6)

    def test_no_bias(self, rng_key):
        layer = Linear(LinearConfig(in_features=4, out_features=4, has_bias=False))
        p = layer.init(rng_key, (2, 4))
        assert "bias" not in p

    def test_config_validation(self):
        with pytest.raises(ConfigError):
            Linear(LinearConfig(in_features=0, out_features=4))
        with pytest.raises(ConfigError):
            Linear(LinearConfig(in_features=4, out_features=4, initializer="nope"))

    def test_shape_mismatch_raises(self, rng_key):
        layer = Linear(LinearConfig(in_features=8, out_features=4))
        with pytest.raises(ValueError, match="in_features"):
            layer.init(rng_key, (2, 5))

    def test_parameter_count(self, rng_key):
        layer = Linear(LinearConfig(in_features=8, out_features=16))
        p = layer.init(rng_key, (1, 8))
        assert layer.parameter_count(p) == 8 * 16 + 16

    def test_output_shape(self):
        layer = Linear(LinearConfig(in_features=8, out_features=3))
        assert layer.output_shape((2, 5, 8)) == (2, 5, 3)


class TestNormLayers:
    def test_layernorm(self, rng_key):
        layer = LayerNorm(LayerNormConfig(features=32))
        p = layer.init(rng_key, (4, 32))
        y = layer.apply(p, jax.random.normal(rng_key, (4, 32)) * 3)
        np.testing.assert_allclose(y.mean(-1), 0, atol=1e-5)

    def test_rmsnorm(self, rng_key):
        layer = RMSNorm(LayerNormConfig(features=16))
        p = layer.init(rng_key, (2, 16))
        assert set(p) == {"gamma"}
        y = layer.apply(p, jax.random.normal(rng_key, (2, 16)))
        assert y.shape == (2, 16)


class TestAttentionLayer:
    def test_fused_qkv_contract(self, rng_key):
        layer = Attention(AttentionConfig(embedding_dim=16, num_heads=4))
        x = jax.random.normal(rng_key, (2, 6, 48))
        y = layer.apply({}, x)
        assert y.shape == (2, 6, 16)
        np.testing.assert_allclose(y, ops.mha_qkv(x, 4), rtol=1e-6)

    def test_wrong_input_dim_raises(self, rng_key):
        layer = Attention(AttentionConfig(embedding_dim=16, num_heads=4))
        with pytest.raises(ValueError, match="fused QKV"):
            layer.apply({}, jnp.zeros((1, 4, 16)))

    def test_config_validation(self):
        with pytest.raises(ConfigError):
            Attention(AttentionConfig(embedding_dim=10, num_heads=3))


class TestEncoderLayer:
    def test_wte_wpe(self, rng_key):
        layer = Encoder(EncoderConfig(vocab_size=100, embedding_dim=8, max_seq_len=16))
        p = layer.init(rng_key, (2, 5))
        assert p["wte"].shape == (100, 8) and p["wpe"].shape == (16, 8)
        tokens = jnp.array([[1, 2, 3, 4, 5]])
        y = layer.apply(p, tokens)
        assert y.shape == (1, 5, 8)

    def test_no_positional(self, rng_key):
        layer = Encoder(EncoderConfig(vocab_size=10, embedding_dim=4))
        p = layer.init(rng_key, (1, 3))
        assert "wpe" not in p


class TestDropout:
    def test_inference_identity(self, rng_key):
        layer = Dropout(DropoutConfig(rate=0.5))
        x = jax.random.normal(rng_key, (8, 8))
        np.testing.assert_array_equal(layer.apply({}, x, training=False), x)

    def test_training_drops_and_scales(self, rng_key):
        layer = Dropout(DropoutConfig(rate=0.5))
        x = jnp.ones((100, 100))
        y = layer.apply({}, x, training=True, rngs={"dropout": rng_key})
        frac_zero = float((y == 0).mean())
        assert 0.4 < frac_zero < 0.6
        # Kept values are scaled by 1/keep.
        assert np.allclose(np.asarray(y)[np.asarray(y) != 0], 2.0)

    def test_training_without_rng_raises(self):
        layer = Dropout(DropoutConfig(rate=0.5))
        with pytest.raises(ValueError, match="rngs"):
            layer.apply({}, jnp.ones((2, 2)), training=True)


class TestSequentialComposite:
    def test_mnist_style_stack(self, rng_key):
        net = Sequential([
            ("fc1", Linear(LinearConfig(in_features=784, out_features=128))),
            ("act1", Gelu()),
            ("fc2", Linear(LinearConfig(in_features=128, out_features=64))),
            ("act2", Gelu()),
            ("fc3", Linear(LinearConfig(in_features=64, out_features=10))),
        ])
        p = net.init(rng_key, (4, 784))
        assert set(p) == {"fc1", "act1", "fc2", "act2", "fc3"}
        y = net.apply(p, jax.random.normal(rng_key, (4, 784)))
        assert y.shape == (4, 10)
        assert net.output_shape((4, 784)) == (4, 10)
        assert net.parameter_count(p) == 784 * 128 + 128 + 128 * 64 + 64 + 64 * 10 + 10

    def test_child_management(self):
        net = Sequential()
        fc = Linear(LinearConfig(in_features=2, out_features=2))
        net.add("fc", fc)
        assert net.has("fc") and net.get("fc") is fc
        with pytest.raises(KeyError):
            net.add("fc", fc)
        net.replace("fc", Gelu())
        net.remove("fc")
        assert not net.has("fc")

    def test_grads_flow_through_stack(self, rng_key):
        net = Sequential([
            ("fc1", Linear(LinearConfig(in_features=8, out_features=8))),
            ("act", Gelu()),
            ("fc2", Linear(LinearConfig(in_features=8, out_features=4))),
        ])
        p = net.init(rng_key, (2, 8))
        x = jax.random.normal(rng_key, (2, 8))
        grads = jax.grad(lambda p: jnp.sum(net.apply(p, x) ** 2))(p)
        assert grads["fc1"]["weight"].shape == (8, 8)
        assert float(jnp.abs(grads["fc1"]["weight"]).max()) > 0


class TestResidualWrapper:
    def test_identity_plus_inner(self, rng_key):
        inner = Linear(LinearConfig(in_features=4, out_features=4))
        res = Residual(inner)
        p = res.init(rng_key, (2, 4))
        x = jax.random.normal(rng_key, (2, 4))
        np.testing.assert_allclose(
            res.apply(p, x), inner.apply(p["inner"], x) + x, rtol=1e-6
        )


class TestLossModule:
    def test_mean_reduction_ignores_masked(self, rng_key):
        loss_mod = SoftmaxCrossEntropy()
        logits = jax.random.normal(rng_key, (4, 10))
        targets = jnp.array([1, 2, -100, 3])
        loss = loss_mod.apply({}, logits, targets=targets)
        per_row = ops.softmax_cross_entropy(logits, targets)
        np.testing.assert_allclose(loss, per_row.sum() / 3, rtol=1e-6)
