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


class TestPackedInt4:
    """Nibble-packed INT4 kernel (split-halves layout, quantize.pack_int4)."""

    def test_pack_unpack_roundtrip(self, rng_key):
        from mila_tpu.inference.quantize import pack_int4, unpack_int4

        w = jax.random.normal(rng_key, (256, 128)) * 0.05
        # build an unpacked int4-valued QTensor by hand
        from mila_tpu.inference.quantize import QTensor
        import jax.numpy as jnp

        q = jnp.clip(jnp.round(w * 50), -7, 7).astype(jnp.int8)
        qt = QTensor(q, jnp.ones((1, 128), jnp.float32), 256)
        packed = pack_int4(qt)
        assert packed.q.shape == (128, 128)
        assert packed.packed_rows == 256
        back = unpack_int4(packed)
        np.testing.assert_array_equal(np.asarray(back.q), np.asarray(q))

    def test_quantize_int4_is_packed(self, rng_key):
        w = jax.random.normal(rng_key, (512, 256)) * 0.02
        qt = quantize(w, "int4")
        assert qt.packed_rows == 512
        assert qt.q.shape == (256, 256)
        assert qt.q.dtype == jnp.int8

    def test_dequantize_packed(self, rng_key):
        from mila_tpu.inference.quantize import dequantize

        w = jax.random.normal(rng_key, (512, 256)) * 0.02
        qt = quantize(w, "int4")
        back = dequantize(qt)
        # int4 absmax: coarse but correlated
        err = np.abs(np.asarray(back) - np.asarray(w)).max()
        assert err < np.abs(np.asarray(w)).max() / 7.0 + 1e-6

    @pytest.mark.parametrize("M", [1, 8, 32])
    def test_decode_kernel_matches_reference(self, rng_key, M):
        k1, k2 = jax.random.split(rng_key)
        x = jax.random.normal(k1, (M, 512), jnp.bfloat16)
        w = jax.random.normal(k2, (512, 1024)) * 0.02
        qt = quantize(w, "int4")
        out = quant_linear(x, qt)
        ref = quant_linear_ref(x, qt, compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=3e-2, atol=3e-2,
        )

    def test_block_scales(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        x = jax.random.normal(k1, (8, 1024), jnp.bfloat16)
        w = jax.random.normal(k2, (1024, 512)) * 0.02
        qt = quantize(w, "int4", block_size=256)
        out = quant_linear(x, qt)
        ref = quant_linear_ref(x, qt, compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=3e-2, atol=3e-2,
        )

    def test_prefill_falls_back_to_int8_path(self, rng_key):
        """M > 32 unpacks and runs the int8 Pallas/ref path."""
        k1, k2 = jax.random.split(rng_key)
        x = jax.random.normal(k1, (128, 512), jnp.bfloat16)
        w = jax.random.normal(k2, (512, 256)) * 0.02
        qt = quantize(w, "int4")
        out = quant_linear(x, qt)
        ref = quant_linear_ref(x, qt, compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=3e-2, atol=3e-2,
        )

    def test_bias_and_silu(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        x = jax.random.normal(k1, (8, 512), jnp.bfloat16)
        w = jax.random.normal(k2, (512, 256)) * 0.02
        b = jax.random.normal(jax.random.fold_in(rng_key, 1), (256,), jnp.float32)
        qt = quantize(w, "int4")
        out = quant_linear(x, qt, b, activation="silu")
        ref = quant_linear_ref(x, qt, b, compute_dtype=jnp.bfloat16)
        ref = ref * jax.nn.sigmoid(ref.astype(jnp.float32)).astype(ref.dtype)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=5e-2, atol=5e-2,
        )

    def test_int4_memory_halves(self, rng_key):
        from mila_tpu.inference.quantize import model_bytes

        w = jax.random.normal(rng_key, (1024, 1024)) * 0.02
        q8 = quantize(w, "int8")
        q4 = quantize(w, "int4")
        assert q4.q.nbytes * 2 == q8.q.nbytes


class TestFp8BitDecode:
    """_load_w decodes fp8 bit patterns with integer ops (the native Mosaic
    fp8->bf16 cast widens through f32 and is ~6x slower on v5e). The decode
    is value * 2^-(127-bias); _w_scale_fixup compensates."""

    @pytest.mark.parametrize("dt", ["fp8_e4m3", "fp8_e5m2"])
    def test_all_byte_patterns_exact(self, dt):
        import numpy as np

        from mila_tpu.inference.quantize import QUANT_DTYPES
        from mila_tpu.kernels.quant_matmul import _load_w, _w_scale_fixup

        jdt = QUANT_DTYPES[dt]
        raw = np.arange(256, dtype=np.uint8).view(np.int8)
        w = jax.lax.bitcast_convert_type(jnp.asarray(raw), jdt)
        ref = np.asarray(w.astype(jnp.float32))
        got = np.asarray(_load_w(w).astype(jnp.float32)) * _w_scale_fixup(jdt)
        finite = np.isfinite(ref)
        # fp8 subnormals land below the bf16 normal range mid-decode and are
        # flushed to zero (max abs error 7*2^-9 on the pre-scale lattice —
        # 3e-5 of absmax, far below the quantization error itself). Normals
        # must be bit-exact. NaN/inf never occur in absmax-clipped weights.
        sub_max = {"fp8_e4m3": 2.0**-6, "fp8_e5m2": 2.0**-14}[dt]
        subnormal = finite & (np.abs(ref) < sub_max)
        exact = finite & ~subnormal
        assert np.array_equal(got[exact], ref[exact])
        assert np.all((got[subnormal] == 0.0) | (got[subnormal] == ref[subnormal]))

    def test_int8_passthrough(self, rng_key):
        from mila_tpu.kernels.quant_matmul import _load_w, _w_scale_fixup

        w = jax.random.randint(rng_key, (8, 8), -128, 127, jnp.int8)
        assert _w_scale_fixup(jnp.int8) == 1.0
        assert jnp.array_equal(_load_w(w), w.astype(jnp.bfloat16))

    @pytest.mark.parametrize("dt", ["fp8_e4m3", "fp8_e5m2"])
    def test_quant_linear_fp8_matches_reference(self, rng_key, dt):
        from mila_tpu.inference.quantize import quant_linear_ref, quantize
        from mila_tpu.kernels.quant_matmul import quant_linear

        k1, k2 = jax.random.split(rng_key)
        x = jax.random.normal(k1, (8, 256), jnp.float32)
        w = jax.random.normal(k2, (256, 512), jnp.float32)
        qt = quantize(w, dt)
        got = quant_linear(x, qt, block_m=8, interpret=True)
        ref = quant_linear_ref(x, qt, compute_dtype=jnp.bfloat16)
        # Decode exactness is covered bit-for-bit above; this checks the
        # kernel plumbing (scale_fix folding), so a norm-relative bound is
        # the right metric under bf16 rounding.
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 0.01, rel
