"""Tensor system tests: dtypes, initializers, tensor ops, axis partitioning
(mirrors reference Tests/Dnn/Tensors/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.tensor import (
    compute_axis_partition,
    copy,
    dtypes,
    fill,
    init,
    normalize_axis,
    to_host,
)


class TestDtypes:
    def test_registry_covers_reference_set(self):
        # TensorDataType.ixx:35-53 parity set + INT4 extension.
        names = {t.name for t in dtypes.all_dtypes()}
        for required in [
            "FP32", "FP16", "BF16", "FP8_E4M3", "FP8_E5M2",
            "INT8", "INT16", "INT32", "UINT8", "UINT16", "UINT32", "INT4",
        ]:
            assert required in names

    def test_traits(self):
        assert dtypes.BF16.size_in_bytes == 2
        assert dtypes.BF16.is_float and dtypes.BF16.mxu_native
        assert dtypes.INT4.packed and dtypes.INT4.bits == 4
        assert dtypes.FP32.min_tile == (8, 128)
        assert dtypes.INT8.min_tile == (32, 128)

    def test_lookup_round_trip(self):
        for t in dtypes.all_dtypes():
            assert dtypes.from_name(t.name) is t
            assert dtypes.from_jnp(t.jnp_dtype).name == t.name
        assert dtypes.from_name("bfloat16") is dtypes.BF16
        with pytest.raises(KeyError):
            dtypes.from_name("complex64")

    def test_host_equivalents(self):
        assert dtypes.host_equivalent(jnp.float8_e4m3fn) == np.float32
        assert dtypes.host_equivalent(jnp.float32) == np.float32


class TestInitializers:
    def test_zeros_ones_full(self):
        assert jnp.all(init.zeros((3, 4)) == 0)
        assert jnp.all(init.ones((3, 4)) == 1)
        assert jnp.all(init.full((2,), 7.0) == 7.0)

    def test_uniform_range(self, rng_key):
        x = init.uniform(rng_key, (1000,), -2.0, 3.0)
        assert x.min() >= -2.0 and x.max() < 3.0

    def test_xavier_variance(self, rng_key):
        fan_in, fan_out = 256, 128
        w = init.xavier_uniform(rng_key, (fan_in, fan_out))
        expected_var = 2.0 / (fan_in + fan_out)
        np.testing.assert_allclose(w.var(), expected_var, rtol=0.15)

    def test_he_variance(self, rng_key):
        w = init.he_normal(rng_key, (512, 64))
        np.testing.assert_allclose(w.var(), 2.0 / 512, rtol=0.2)

    def test_dtype_cast(self, rng_key):
        w = init.xavier_uniform(rng_key, (8, 8), dtype=jnp.bfloat16)
        assert w.dtype == jnp.bfloat16

    def test_registry_names(self):
        assert "xavier" in init.INITIALIZERS
        assert init.INITIALIZERS["xavier"] is init.xavier_uniform


class TestTensorOps:
    def test_copy_converts_dtype(self, rng_key):
        x = jax.random.normal(rng_key, (4, 4))
        y = copy(x, dtype=jnp.bfloat16)
        assert y.dtype == jnp.bfloat16
        np.testing.assert_allclose(to_host(y).astype(np.float32), x, rtol=1e-2)

    def test_fill(self):
        x = fill((2, 3), 1.5)
        assert x.shape == (2, 3) and float(x[0, 0]) == 1.5

    def test_to_host_returns_numpy(self, rng_key):
        x = jax.random.normal(rng_key, (3,))
        h = to_host(x)
        assert isinstance(h, np.ndarray)


class TestAxisPartition:
    def test_partition(self):
        # Tensor.Partitioning.ixx:17-35 semantics.
        p = compute_axis_partition((2, 3, 4, 5), axis=2)
        assert (p.outer, p.axis_size, p.inner) == (6, 4, 5)
        assert p.num_slices == 30

    def test_negative_axis(self):
        p = compute_axis_partition((2, 3, 4), axis=-1)
        assert p.axis == 2 and p.inner == 1 and p.outer == 6

    def test_invalid_axis_raises(self):
        with pytest.raises(ValueError):
            normalize_axis(5, 3)
