"""Block tests (mirrors Tests/Dnn/Components/Blocks/MLP.{Cpu,Cuda}.cpp and
the Transformer block tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.nn import (
    MLP,
    MLPConfig,
    TransformerBlock,
    TransformerBlockConfig,
)
from mila_tpu.utils.config import ConfigError


class TestMLP:
    def test_forward_shape(self, rng_key):
        mlp = MLP(MLPConfig(in_features=16, hidden_features=64, out_features=8))
        p = mlp.init(rng_key, (2, 16))
        y = mlp.apply(p, jax.random.normal(rng_key, (2, 16)))
        assert y.shape == (2, 8)

    def test_default_out_features(self, rng_key):
        mlp = MLP(MLPConfig(in_features=16, hidden_features=32))
        assert mlp.output_shape((2, 16)) == (2, 16)

    def test_with_layernorm(self, rng_key):
        mlp = MLP(MLPConfig(in_features=8, hidden_features=16, use_layernorm=True))
        p = mlp.init(rng_key, (2, 8))
        assert "ln" in p
        y = mlp.apply(p, jax.random.normal(rng_key, (2, 8)))
        assert y.shape == (2, 8)

    def test_validation(self):
        with pytest.raises(ConfigError):
            MLP(MLPConfig(in_features=0, hidden_features=4))


class TestTransformerBlock:
    def test_forward_preserves_shape(self, rng_key):
        blk = TransformerBlock(TransformerBlockConfig(embedding_dim=32, num_heads=4))
        p = blk.init(rng_key, (2, 6, 32))
        x = jax.random.normal(rng_key, (2, 6, 32))
        y = blk.apply(p, x)
        assert y.shape == x.shape

    def test_param_structure(self, rng_key):
        blk = TransformerBlock(TransformerBlockConfig(embedding_dim=16, num_heads=2))
        p = blk.init(rng_key, (1, 4, 16))
        assert set(p) == {"ln1", "qkv", "attn", "proj", "ln2", "mlp"}
        assert p["qkv"]["weight"].shape == (16, 48)
        assert p["mlp"]["fc1"]["weight"].shape == (16, 64)

    def test_causality(self, rng_key):
        """Future-token perturbation must not affect earlier positions."""
        k1, k2 = jax.random.split(rng_key)
        blk = TransformerBlock(TransformerBlockConfig(embedding_dim=16, num_heads=2))
        p = blk.init(k1, (1, 8, 16))
        x = jax.random.normal(k1, (1, 8, 16))
        y1 = blk.apply(p, x)
        x2 = x.at[:, 6:].add(jax.random.normal(k2, (1, 2, 16)))
        y2 = blk.apply(p, x2)
        np.testing.assert_allclose(y1[:, :6], y2[:, :6], rtol=1e-4, atol=1e-5)

    def test_grads_flow_to_all_params(self, rng_key):
        blk = TransformerBlock(TransformerBlockConfig(embedding_dim=16, num_heads=2))
        p = blk.init(rng_key, (1, 4, 16))
        x = jax.random.normal(rng_key, (1, 4, 16))
        g = jax.grad(lambda p: jnp.sum(blk.apply(p, x) ** 2))(p)
        for leaf in jax.tree_util.tree_leaves(g):
            assert float(jnp.abs(leaf).max()) > 0

    def test_jit_compiles(self, rng_key):
        blk = TransformerBlock(TransformerBlockConfig(embedding_dim=16, num_heads=2))
        p = blk.init(rng_key, (1, 4, 16))
        x = jax.random.normal(rng_key, (1, 4, 16))
        y = jax.jit(lambda p, x: blk.apply(p, x))(p, x)
        np.testing.assert_allclose(y, blk.apply(p, x), rtol=1e-5, atol=1e-6)
