"""Fused AdamW + fused softmax-CE Pallas kernels vs oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.kernels.fused_adamw import fused_adamw_update
from mila_tpu.kernels.softmax_ce import fused_softmax_cross_entropy
from mila_tpu.ops import softmax_cross_entropy


class TestFusedAdamW:
    def test_matches_jnp_optimizer(self, rng_key):
        from mila_tpu.optim import AdamW, AdamWConfig

        k1, k2 = jax.random.split(rng_key)
        p = jax.random.normal(k1, (1024,))
        g = jax.random.normal(k2, (1024,))
        opt = AdamW(AdamWConfig(learning_rate=0.01, weight_decay=0.1))
        state = opt.init({"p": p})
        p_ref, state_ref = opt.step(state, {"p": p}, {"p": g})

        p_new, m_new, v_new, _ = fused_adamw_update(
            p, g, jnp.zeros_like(p), jnp.zeros_like(p), None,
            step=jnp.int32(1), lr=0.01, weight_decay=0.1,
        )
        np.testing.assert_allclose(p_new, p_ref["p"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(m_new, state_ref.m["p"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(v_new, state_ref.v["p"], rtol=1e-5, atol=1e-6)

    def test_unpadded_odd_size(self, rng_key):
        """Non-lane-aligned parameter count pads internally."""
        p = jax.random.normal(rng_key, (1000,))
        g = jnp.ones((1000,))
        p_new, m_new, v_new, _ = fused_adamw_update(
            p, g, jnp.zeros_like(p), jnp.zeros_like(p), None,
            step=jnp.int32(1), lr=0.1, weight_decay=0.0,
        )
        assert p_new.shape == (1000,)
        # All elements got the same |update| on step 1 with uniform grads.
        delta = np.asarray(p_new - p)
        np.testing.assert_allclose(delta, delta[0], rtol=1e-4)

    def test_2d_param(self, rng_key):
        p = jax.random.normal(rng_key, (64, 32))
        g = jax.random.normal(jax.random.fold_in(rng_key, 1), (64, 32))
        p_new, *_ = fused_adamw_update(
            p, g, jnp.zeros_like(p), jnp.zeros_like(p), None,
            step=jnp.int32(1), lr=0.01,
        )
        assert p_new.shape == (64, 32)

    def test_bf16_param_with_master(self, rng_key):
        p32 = jax.random.normal(rng_key, (512,))
        p = p32.astype(jnp.bfloat16)
        g = jnp.full((512,), 0.5, jnp.bfloat16)
        p_new, m, v, master = fused_adamw_update(
            p, g, jnp.zeros((512,)), jnp.zeros((512,)), p32,
            step=jnp.int32(1), lr=1e-4, weight_decay=0.0, seed=7,
        )
        assert p_new.dtype == jnp.bfloat16 and master is not None
        # Master follows the exact f32 update.
        np.testing.assert_allclose(master, p32 - 1e-4 * np.sign(0.5), rtol=1e-2)


class TestFusedSoftmaxCE:
    def test_forward_matches_oracle(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        logits = jax.random.normal(k1, (32, 256))
        targets = jax.random.randint(k2, (32,), 0, 256)
        out = fused_softmax_cross_entropy(logits, targets)
        ref = softmax_cross_entropy(logits, targets)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_ignore_index(self, rng_key):
        logits = jax.random.normal(rng_key, (8, 128))
        targets = jnp.array([1, -100, 3, -100, 5, 6, 7, 8])
        out = fused_softmax_cross_entropy(logits, targets)
        assert out[1] == 0.0 and out[3] == 0.0

    def test_backward_matches_oracle(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        logits = jax.random.normal(k1, (16, 128))
        targets = jax.random.randint(k2, (16,), 0, 128)
        gm = jax.grad(lambda l: fused_softmax_cross_entropy(l, targets).mean())(logits)
        gr = jax.grad(lambda l: softmax_cross_entropy(l, targets).mean())(logits)
        np.testing.assert_allclose(gm, gr, rtol=1e-4, atol=1e-6)

    def test_3d_batch(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        logits = jax.random.normal(k1, (2, 8, 128))
        targets = jax.random.randint(k2, (2, 8), 0, 128)
        out = fused_softmax_cross_entropy(logits, targets)
        assert out.shape == (2, 8)
        ref = softmax_cross_entropy(logits, targets)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_ragged_fallback(self, rng_key):
        """Vocab not divisible by 128 routes to the jnp path."""
        k1, k2 = jax.random.split(rng_key)
        logits = jax.random.normal(k1, (4, 97))
        targets = jax.random.randint(k2, (4,), 0, 97)
        out = fused_softmax_cross_entropy(logits, targets)
        ref = softmax_cross_entropy(logits, targets)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


class TestQuantizedLinearLayerIntegration:
    def test_linear_layer_accepts_qtensor(self, rng_key):
        from mila_tpu.inference.quantize import quantize
        from mila_tpu.nn import Linear, LinearConfig

        layer = Linear(LinearConfig(in_features=256, out_features=128))
        p = layer.init(rng_key, (4, 256))
        qp = {"weight": quantize(p["weight"], "int8"), "bias": p["bias"]}
        x = jax.random.normal(rng_key, (4, 256))
        y_q = layer.apply(qp, x)
        y_f = layer.apply(p, x)
        rel = float(jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f))
        assert rel < 0.05
