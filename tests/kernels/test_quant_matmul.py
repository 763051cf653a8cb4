"""Quantized matmul Pallas kernel vs jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference.quantize import quant_linear_ref, quantize
from mila_tpu.kernels.quant_matmul import quant_linear


class TestQuantMatmulKernel:
    @pytest.mark.parametrize("dtype", ["int8", "fp8_e4m3"])
    def test_matches_reference(self, rng_key, dtype):
        k1, k2 = jax.random.split(rng_key)
        x = jax.random.normal(k1, (128, 512), jnp.float32)
        w = jax.random.normal(k2, (512, 256)) * 0.02
        qt = quantize(w, dtype)
        out = quant_linear(x, qt)
        ref = quant_linear_ref(x, qt, compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
        )

    def test_close_to_float_matmul(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        x = jax.random.normal(k1, (64, 512), jnp.float32)
        w = jax.random.normal(k2, (512, 256)) * 0.02
        qt = quantize(w, "int8", block_size=128)
        out = quant_linear(x, qt)
        ref = x @ w
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, rel

    def test_bias_epilogue(self, rng_key):
        k1, k2, k3 = jax.random.split(rng_key, 3)
        x = jax.random.normal(k1, (32, 256))
        w = jax.random.normal(k2, (256, 128)) * 0.05
        b = jax.random.normal(k3, (128,))
        qt = quantize(w, "int8")
        out = quant_linear(x, qt, b)
        ref = quant_linear_ref(x, qt, b, compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)

    def test_gelu_epilogue(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        x = jax.random.normal(k1, (32, 256))
        w = jax.random.normal(k2, (256, 128)) * 0.05
        qt = quantize(w, "int8")
        out = quant_linear(x, qt, activation="gelu")
        ref = jax.nn.gelu(quant_linear_ref(x, qt, compute_dtype=jnp.bfloat16), approximate=True)
        np.testing.assert_allclose(out, ref, rtol=5e-2, atol=3e-2)

    def test_block_scales(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        x = jax.random.normal(k1, (16, 1024))
        w = jax.random.normal(k2, (1024, 128)) * 0.02
        qt = quantize(w, "int8", block_size=256)
        out = quant_linear(x, qt, block_k=256)
        ref = x @ w
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02

    def test_batched_input_reshape(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        x = jax.random.normal(k1, (2, 8, 256))
        w = jax.random.normal(k2, (256, 128)) * 0.05
        qt = quantize(w, "int8")
        out = quant_linear(x, qt)
        assert out.shape == (2, 8, 128)

    def test_small_fallback(self, rng_key):
        """Tiny N falls back to the jnp reference path."""
        k1, k2 = jax.random.split(rng_key)
        x = jax.random.normal(k1, (4, 32))
        w = jax.random.normal(k2, (32, 16)) * 0.1
        qt = quantize(w, "int8")
        out = quant_linear(x, qt)
        ref = quant_linear_ref(x, qt)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_jit(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        x = jax.random.normal(k1, (32, 256))
        qt = quantize(jax.random.normal(k2, (256, 128)) * 0.05, "int8")
        f = jax.jit(lambda x, qt: quant_linear(x, qt))
        np.testing.assert_allclose(f(x, qt), quant_linear(x, qt), rtol=1e-5, atol=1e-5)
