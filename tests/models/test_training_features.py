"""Gradient accumulation + remat training features."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.data import ArrayReader
from mila_tpu.models import MLPClassifier, MLPClassifierConfig, Model, ModelConfig
from mila_tpu.nn import TransformerBlock, TransformerBlockConfig
from mila_tpu.optim import SGD, SGDConfig, AdamW, AdamWConfig


class TestGradAccum:
    def test_accum_equals_full_batch_sgd(self, rng_key):
        """accum=4 with plain SGD must equal one full-batch step exactly
        (mean-of-means with equal microbatches)."""
        x = np.random.default_rng(0).normal(size=(32, 784)).astype(np.float32)
        y = np.random.default_rng(1).integers(0, 10, 32).astype(np.int32)

        def make(accum):
            m = Model(
                MLPClassifier(MLPClassifierConfig(hidden_dims=(16,))),
                optimizer=None,
                config=ModelConfig(epochs=1, verbose=False, grad_accum_steps=accum),
            )
            # Same SGD-like behavior via AdamW is nonlinear; use SGD.
            m.optimizer = SGD(SGDConfig(learning_rate=0.1))
            m.build(jax.random.key(0), (32, 784))
            m.opt_state = m.optimizer.init(m.params)
            m._compile()
            return m

        m1, m4 = make(1), make(4)
        p1, s1, l1 = m1._train_step(m1.params, m1.opt_state, jnp.asarray(x), jnp.asarray(y))
        p4, s4, l4 = m4._train_step(m4.params, m4.opt_state, jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(float(l1), float(l4), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p4)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_bad_accum_config(self):
        from mila_tpu.utils.config import ConfigError

        with pytest.raises(ConfigError):
            ModelConfig(grad_accum_steps=0).validate()


class TestRemat:
    def test_remat_same_forward_and_grads(self, rng_key):
        cfg = TransformerBlockConfig(embedding_dim=32, num_heads=4)
        blk = TransformerBlock(cfg)
        blk_r = TransformerBlock(cfg.replace(remat=True))
        params = blk.init(rng_key, (2, 8, 32))
        x = jax.random.normal(rng_key, (2, 8, 32))

        y1 = blk.apply(params, x, training=True)
        y2 = blk_r.apply(params, x, training=True)
        np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-6)

        g1 = jax.grad(lambda p: jnp.sum(blk.apply(p, x, training=True) ** 2))(params)
        g2 = jax.grad(lambda p: jnp.sum(blk_r.apply(p, x, training=True) ** 2))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
