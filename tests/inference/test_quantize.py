"""Weight-only quantization tests (BASELINE: INT8/FP8 weight-only path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference.quantize import (
    QTensor,
    dequantize,
    model_bytes,
    quant_linear_ref,
    quantization_error,
    quantize,
    quantize_model_params,
)


class TestQuantizeDequantize:
    @pytest.mark.parametrize("dtype,tol", [("int8", 0.01), ("fp8_e4m3", 0.04), ("fp8_e5m2", 0.08)])
    def test_round_trip_error_small(self, rng_key, dtype, tol):
        # Tolerances track mantissa width: int8 ≈ 7 bits after scaling,
        # e4m3 has 3 mantissa bits, e5m2 only 2.
        w = jax.random.normal(rng_key, (256, 64)) * 0.02
        err = quantization_error(w, dtype)
        assert err < tol, f"{dtype} rel RMS error {err}"

    def test_int8_per_channel_exact_scale(self):
        w = jnp.array([[1.0, -2.0], [0.5, 4.0]])  # [in=2, out=2]
        qt = quantize(w, "int8")
        assert qt.q.dtype == jnp.int8 and qt.scale.shape == (1, 2)
        np.testing.assert_allclose(qt.scale[0], [1.0 / 127, 4.0 / 127], rtol=1e-5)
        back = dequantize(qt)
        np.testing.assert_allclose(back, w, atol=0.05)

    def test_block_scales(self, rng_key):
        w = jax.random.normal(rng_key, (128, 32))
        qt = quantize(w, "int8", block_size=32)
        assert qt.scale.shape == (4, 32)
        # Blockwise quantization is at least as accurate as per-channel.
        err_block = quantization_error(w, "int8", 32)
        err_chan = quantization_error(w, "int8")
        assert err_block <= err_chan + 1e-6

    def test_outlier_robustness_blockwise(self, rng_key):
        """An outlier in one block must not destroy other blocks' precision."""
        w = jax.random.normal(rng_key, (128, 16)) * 0.01
        w = w.at[0, 0].set(100.0)
        qt = quantize(w, "int8", block_size=32)
        back = dequantize(qt)
        np.testing.assert_allclose(back[32:], w[32:], atol=1e-3)

    def test_bad_block_size(self, rng_key):
        with pytest.raises(ValueError, match="divisible"):
            quantize(jnp.zeros((100, 8)), "int8", block_size=33)

    def test_qtensor_is_pytree(self, rng_key):
        qt = quantize(jax.random.normal(rng_key, (64, 8)), "int8", 32)
        leaves, treedef = jax.tree_util.tree_flatten(qt)
        assert len(leaves) == 2
        qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert qt2.block_size == 32


class TestQuantLinear:
    def test_matches_float_linear(self, rng_key):
        k1, k2, k3 = jax.random.split(rng_key, 3)
        x = jax.random.normal(k1, (8, 256))
        w = jax.random.normal(k2, (256, 64)) * 0.02
        b = jax.random.normal(k3, (64,)) * 0.01
        qt = quantize(w, "int8", block_size=64)
        y_q = quant_linear_ref(x, qt, b, compute_dtype=jnp.float32)
        y_f = x @ w + b
        rel = float(jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f))
        assert rel < 0.02, f"int8 matmul rel error {rel}"

    def test_jittable(self, rng_key):
        x = jax.random.normal(rng_key, (4, 128))
        qt = quantize(jax.random.normal(rng_key, (128, 32)), "int8")
        y = jax.jit(lambda x, qt: quant_linear_ref(x, qt))(x, qt)
        assert y.shape == (4, 32)


class TestModelQuantization:
    def test_quantize_llama_params(self, rng_key):
        from mila_tpu.models.llama import Llama, LlamaConfig

        model = Llama(LlamaConfig.tiny(vocab_size=128))
        params = model.init(rng_key, (1, 8))
        qparams = quantize_model_params(params, "int8", min_size=1024)
        # Projections quantized; embeddings/norms untouched.
        assert isinstance(qparams["h0"]["wq"]["weight"], QTensor)
        assert not isinstance(qparams["embed"]["wte"], QTensor)
        assert not isinstance(qparams["h0"]["ln_attn"]["gamma"], QTensor)
        # ~4x weight compression on quantized leaves.
        assert model_bytes(qparams) < model_bytes(params)

    def test_quantized_model_forward_close(self, rng_key):
        """INT8 weight-only Llama forward ≈ float forward (perplexity-Δ gate
        in miniature)."""
        from mila_tpu.models.llama import Llama, LlamaConfig
        from mila_tpu.ops import linear as linear_op

        model = Llama(LlamaConfig.tiny(vocab_size=128))
        params = model.init(rng_key, (1, 8))
        qparams = quantize_model_params(params, "int8", min_size=1024)
        # Dequantize-in-place to emulate the quantized forward without
        # touching model code (engine wires QTensor natively).
        deq = jax.tree_util.tree_map(
            lambda l: dequantize(l) if isinstance(l, QTensor) else l,
            qparams,
            is_leaf=lambda l: isinstance(l, QTensor),
        )
        toks = jnp.array([[1, 2, 3, 4]], jnp.int32)
        l_f = model.apply(params, toks)
        l_q = model.apply(deq, toks)
        probs_f = jax.nn.softmax(l_f)
        probs_q = jax.nn.softmax(l_q)
        assert float(jnp.abs(probs_f - probs_q).max()) < 0.05
