"""Fused decode kernels vs composed-op oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference.quantize import quant_linear_ref, quantize
from mila_tpu.kernels.decode_fused import (
    quant_linear_residual,
    rms_quant_linear,
    rms_quant_linear_swiglu,
)
from mila_tpu.ops.rmsnorm import rms_norm
from mila_tpu.ops.swiglu import swiglu

EPS = 1e-5


def _data(key, M, K, N, qdtype="int8", block_size=0):
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (M, K), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(k2, (K, N), jnp.float32) * 0.02
    gamma = 1.0 + 0.1 * jax.random.normal(k3, (K,), jnp.float32)
    return x, quantize(w, qdtype, block_size), gamma


class TestRmsQuantLinear:
    @pytest.mark.parametrize("M", [1, 8, 32])
    def test_matches_composed(self, rng_key, M):
        x, qt, gamma = _data(rng_key, M, 512, 1024)
        out = rms_quant_linear(x, gamma, qt, eps=EPS)
        ref = quant_linear_ref(rms_norm(x, gamma, EPS), qt)
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref.astype(jnp.float32), rtol=3e-2, atol=3e-2
        )

    def test_block_scales(self, rng_key):
        x, qt, gamma = _data(rng_key, 8, 512, 1024, block_size=256)
        out = rms_quant_linear(x, gamma, qt, eps=EPS)
        ref = quant_linear_ref(rms_norm(x, gamma, EPS), qt)
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref.astype(jnp.float32), rtol=3e-2, atol=3e-2
        )

    def test_3d_input(self, rng_key):
        x, qt, gamma = _data(rng_key, 8, 512, 1024)
        out3 = rms_quant_linear(x.reshape(8, 1, 512), gamma, qt, eps=EPS)
        assert out3.shape == (8, 1, 1024)
        out2 = rms_quant_linear(x, gamma, qt, eps=EPS)
        np.testing.assert_allclose(
            out3.reshape(8, 1024).astype(jnp.float32),
            out2.astype(jnp.float32),
        )

    def test_prefill_m_falls_back(self, rng_key):
        """M > 32 routes to the composed reference (prefill shapes)."""
        x, qt, gamma = _data(rng_key, 64, 512, 1024)
        out = rms_quant_linear(x, gamma, qt, eps=EPS)
        ref = quant_linear_ref(rms_norm(x, gamma, EPS), qt)
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref.astype(jnp.float32), rtol=3e-2, atol=3e-2
        )


class TestQuantLinearResidual:
    @pytest.mark.parametrize("M", [1, 8])
    def test_matches_composed(self, rng_key, M):
        x, qt, _ = _data(rng_key, M, 512, 1024)
        res = jax.random.normal(
            jax.random.fold_in(rng_key, 7), (M, 1024), jnp.float32
        ).astype(jnp.bfloat16)
        out = quant_linear_residual(x, qt, res)
        ref = (
            quant_linear_ref(x, qt).astype(jnp.float32) + res.astype(jnp.float32)
        ).astype(jnp.bfloat16)
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref.astype(jnp.float32), rtol=3e-2, atol=3e-2
        )

    def test_output_dtype_follows_residual(self, rng_key):
        x, qt, _ = _data(rng_key, 8, 512, 1024)
        res = jnp.zeros((8, 1024), jnp.float32)
        assert quant_linear_residual(x, qt, res).dtype == jnp.float32


class TestRmsQuantLinearSwiglu:
    @pytest.mark.parametrize("M", [1, 8])
    def test_matches_composed(self, rng_key, M):
        K, I = 512, 1024
        x, qt, gamma = _data(rng_key, M, K, 2 * I)
        out = rms_quant_linear_swiglu(x, gamma, qt, eps=EPS)
        assert out.shape == (M, I)
        xn = rms_norm(x, gamma, EPS)
        gu = quant_linear_ref(xn, qt)
        g, u = jnp.split(gu, 2, axis=-1)
        ref = swiglu(g, u)
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref.astype(jnp.float32), rtol=5e-2, atol=5e-2
        )

    def test_block_scales(self, rng_key):
        K, I = 512, 1024
        x, qt, gamma = _data(rng_key, 8, K, 2 * I, block_size=256)
        out = rms_quant_linear_swiglu(x, gamma, qt, eps=EPS)
        xn = rms_norm(x, gamma, EPS)
        g, u = jnp.split(quant_linear_ref(xn, qt), 2, axis=-1)
        ref = swiglu(g, u)
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref.astype(jnp.float32), rtol=5e-2, atol=5e-2
        )

    def test_jit(self, rng_key):
        K, I = 512, 512
        x, qt, gamma = _data(rng_key, 8, K, 2 * I)
        f = jax.jit(lambda x: rms_quant_linear_swiglu(x, gamma, qt, eps=EPS))
        np.testing.assert_allclose(
            f(x).astype(jnp.float32),
            rms_quant_linear_swiglu(x, gamma, qt, eps=EPS).astype(jnp.float32),
        )


class TestFusedKernelsFp8:
    """The fused decode kernels must accept fp8 weights through the integer
    bit-decode (_load_w + scale_fix) — the path the fp8 serving config runs."""

    @pytest.mark.parametrize("qdt", ["fp8_e4m3", "fp8_e5m2"])
    def test_rms_quant_linear(self, rng_key, qdt):
        x, qt, gamma = _data(rng_key, 8, 512, 1024, qdtype=qdt)
        out = rms_quant_linear(x, gamma, qt, eps=EPS)
        ref = quant_linear_ref(rms_norm(x, gamma, EPS), qt)
        rel = float(
            jnp.linalg.norm(out.astype(jnp.float32) - ref.astype(jnp.float32))
            / jnp.linalg.norm(ref.astype(jnp.float32))
        )
        assert rel < 0.015, rel

    @pytest.mark.parametrize("qdt", ["fp8_e4m3", "fp8_e5m2"])
    def test_quant_linear_residual(self, rng_key, qdt):
        x, qt, _ = _data(rng_key, 8, 512, 512, qdtype=qdt)
        out = quant_linear_residual(x, qt, x)
        ref = quant_linear_ref(x, qt) + x.astype(jnp.float32)
        rel = float(
            jnp.linalg.norm(out.astype(jnp.float32) - ref.astype(jnp.float32))
            / jnp.linalg.norm(ref.astype(jnp.float32))
        )
        assert rel < 0.015, rel

    @pytest.mark.parametrize("qdt", ["fp8_e4m3", "fp8_e5m2"])
    def test_rms_quant_linear_swiglu(self, rng_key, qdt):
        x, qt, gamma = _data(rng_key, 8, 512, 2048, qdtype=qdt)
        out = rms_quant_linear_swiglu(x, gamma, qt, eps=EPS)
        gu = quant_linear_ref(rms_norm(x, gamma, EPS), qt)
        g_, u_ = jnp.split(gu, 2, axis=-1)
        ref = swiglu(g_, u_)
        rel = float(
            jnp.linalg.norm(out.astype(jnp.float32) - ref.astype(jnp.float32))
            / jnp.linalg.norm(ref.astype(jnp.float32))
        )
        assert rel < 0.015, rel
