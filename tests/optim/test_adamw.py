"""AdamW tests (mirrors Tests/Dnn/Optimizers/AdamW.{Cuda,Cpu}.cpp:
hyperparameter validation, step math, zeroGrad, multi-param groups,
stochastic rounding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.optim import (
    SGD,
    SGDConfig,
    AdamW,
    AdamWConfig,
    constant,
    global_norm,
    warmup_cosine,
    zero_grads,
)
from mila_tpu.utils.config import ConfigError


def scalar_adamw_reference(p, g, m, v, t, lr, b1, b2, eps, wd):
    """Literal scalar math of CpuAdamWOptimizer.ixx (oracle)."""
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    m_hat = m / (1 - b1**t)
    v_hat = v / (1 - b2**t)
    p = p - lr * (m_hat / (np.sqrt(v_hat) + eps) + wd * p)
    return p, m, v


class TestAdamWConfig:
    def test_validation(self):
        with pytest.raises(ConfigError):
            AdamW(AdamWConfig(learning_rate=-1))
        with pytest.raises(ConfigError):
            AdamW(AdamWConfig(beta1=1.0))
        with pytest.raises(ConfigError):
            AdamW(AdamWConfig(eps=0))
        with pytest.raises(ConfigError):
            AdamW(AdamWConfig(weight_decay=-0.1))

    def test_lr_get_set(self):
        opt = AdamW(AdamWConfig(learning_rate=1e-3))
        assert opt.get_learning_rate() == 1e-3
        opt.set_learning_rate(5e-4)
        assert opt.get_learning_rate() == 5e-4


class TestAdamWStep:
    def test_matches_scalar_reference(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        params = {"w": jax.random.normal(k1, (4, 3)), "b": jax.random.normal(k2, (3,))}
        opt = AdamW(AdamWConfig(learning_rate=0.01, weight_decay=0.1))
        state = opt.init(params)

        p_np = {k: np.asarray(v, np.float64) for k, v in params.items()}
        m_np = {k: np.zeros_like(v) for k, v in p_np.items()}
        v_np = {k: np.zeros_like(v) for k, v in p_np.items()}

        for t in range(1, 4):
            grads = jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, 0.5 * t), params
            )
            params, state = opt.step(state, params, grads)
            for k in p_np:
                p_np[k], m_np[k], v_np[k] = scalar_adamw_reference(
                    p_np[k], 0.5 * t, m_np[k], v_np[k], t, 0.01, 0.9, 0.999, 1e-8, 0.1
                )
        for k in p_np:
            np.testing.assert_allclose(params[k], p_np[k], rtol=1e-5, atol=1e-6)
        assert int(state.step) == 3

    def test_reduces_quadratic_loss(self, rng_key):
        params = {"x": jnp.array([5.0, -3.0])}
        opt = AdamW(AdamWConfig(learning_rate=0.1, weight_decay=0.0))
        state = opt.init(params)
        loss = lambda p: jnp.sum(p["x"] ** 2)  # noqa: E731
        l0 = loss(params)
        # Adam's per-step displacement is bounded by ~lr, so give it enough
        # steps to actually reach the optimum from |x|=5.
        for _ in range(200):
            grads = jax.grad(loss)(params)
            params, state = opt.step(state, params, grads)
        assert loss(params) < l0 * 0.01

    def test_weight_decay_decoupled(self):
        """With zero grads, params shrink by exactly lr*wd factor per step."""
        params = {"w": jnp.array([2.0])}
        opt = AdamW(AdamWConfig(learning_rate=0.1, weight_decay=0.5))
        state = opt.init(params)
        grads = zero_grads(params)
        params2, _ = opt.step(state, params, grads)
        np.testing.assert_allclose(params2["w"], 2.0 * (1 - 0.1 * 0.5), rtol=1e-6)

    def test_grad_clipping(self):
        params = {"w": jnp.zeros(4)}
        opt = AdamW(AdamWConfig(learning_rate=1.0, grad_clip_norm=1.0, weight_decay=0.0))
        state = opt.init(params)
        big = {"w": jnp.full(4, 100.0)}
        assert float(global_norm(big)) == pytest.approx(200.0)
        p2, _ = opt.step(state, params, big)
        # Clipped grad direction is uniform; update magnitude bounded by lr.
        assert float(jnp.abs(p2["w"]).max()) <= 1.0 + 1e-5

    def test_jittable_with_schedule(self, rng_key):
        params = {"w": jax.random.normal(rng_key, (8,))}
        opt = AdamW(AdamWConfig(learning_rate=1e-2))
        state = opt.init(params)
        sched = warmup_cosine(1e-2, 10, 100)

        @jax.jit
        def train_step(state, params, grads):
            return opt.step(state, params, grads, lr=sched(state.step))

        g = {"w": jnp.ones(8)}
        p2, s2 = train_step(state, params, g)
        assert int(s2.step) == 1 and p2["w"].shape == (8,)


class TestStochasticRounding:
    def test_bf16_rounding_unbiased(self, rng_key):
        """Mean of stochastically-rounded values ≈ the f32 value."""
        from mila_tpu.optim.adamw import _stochastic_round

        x = jnp.full((10000,), 1.0 + 1e-3, jnp.float32)  # between bf16 grid points
        r = _stochastic_round(x, rng_key, jnp.bfloat16)
        assert r.dtype == jnp.bfloat16
        mean = float(r.astype(jnp.float32).mean())
        np.testing.assert_allclose(mean, 1.0 + 1e-3, rtol=1e-3)
        # Both neighbors appear.
        assert len(np.unique(np.asarray(r.astype(jnp.float32)))) == 2

    def test_master_params_preserve_precision(self, rng_key):
        """bf16 params with masters accumulate tiny updates that plain bf16 loses."""
        p0 = jnp.ones((256,), jnp.bfloat16)
        opt = AdamW(
            AdamWConfig(learning_rate=1e-5, weight_decay=0.0, stochastic_rounding=True)
        )
        state = opt.init({"w": p0})
        assert state.master is not None
        params = {"w": p0}
        g = {"w": jnp.ones((256,), jnp.bfloat16)}
        for i in range(10):
            params, state = opt.step(state, params, g, rng=jax.random.fold_in(rng_key, i))
        # Master moved by ~10*lr even though each step is below bf16 resolution.
        np.testing.assert_allclose(
            state.master["w"], 1.0 - 10 * 1e-5, rtol=1e-2
        )

    def test_fp16_rounding(self, rng_key):
        from mila_tpu.optim.adamw import _stochastic_round

        x = jnp.full((8192,), 1.0 + 2e-4, jnp.float32)
        r = _stochastic_round(x, rng_key, jnp.float16)
        assert r.dtype == jnp.float16
        np.testing.assert_allclose(
            float(r.astype(jnp.float32).mean()), 1.0 + 2e-4, rtol=1e-3
        )


class TestSGD:
    def test_plain_sgd(self):
        params = {"x": jnp.array([1.0])}
        opt = SGD(SGDConfig(learning_rate=0.1))
        state = opt.init(params)
        p2, _ = opt.step(state, params, {"x": jnp.array([1.0])})
        np.testing.assert_allclose(p2["x"], 0.9, rtol=1e-6)

    def test_momentum_accumulates(self):
        params = {"x": jnp.array([0.0])}
        opt = SGD(SGDConfig(learning_rate=1.0, momentum=0.9))
        state = opt.init(params)
        g = {"x": jnp.array([1.0])}
        params, state = opt.step(state, params, g)
        np.testing.assert_allclose(params["x"], -1.0)
        params, state = opt.step(state, params, g)
        np.testing.assert_allclose(params["x"], -1.0 - 1.9)


class TestZeroGrads:
    def test_zero_grads_structure(self, rng_key):
        params = {"a": jax.random.normal(rng_key, (3,)), "b": {"c": jnp.ones((2, 2))}}
        z = zero_grads(params)
        assert z["b"]["c"].shape == (2, 2)
        assert float(jnp.abs(z["a"]).max()) == 0.0


class TestSchedules:
    def test_constant(self):
        assert float(constant(0.5)(jnp.int32(100))) == 0.5

    def test_warmup_cosine_shape(self):
        s = warmup_cosine(1.0, 10, 110, final_lr=0.1)
        assert float(s(0)) == pytest.approx(0.1, rel=0.01)  # warmup start
        assert float(s(9)) == pytest.approx(1.0, rel=0.01)  # peak
        assert float(s(110)) == pytest.approx(0.1, rel=0.01)  # final
        mid = float(s(60))
        assert 0.1 < mid < 1.0
