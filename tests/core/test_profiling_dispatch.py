"""Profiling utils + attention dispatch tests."""

import jax
import jax.numpy as jnp
import pytest

from mila_tpu.ops.attention import FLASH_MIN_SEQ, attention, resolve_attention_impl
from mila_tpu.utils.profiling import Timer, annotate


class TestAttentionDispatch:
    def test_cpu_always_xla(self):
        assert resolve_attention_impl("auto", seq_len=4096) == "xla"  # cpu backend

    def test_explicit_flags(self):
        assert resolve_attention_impl("flash", seq_len=8) == "flash"
        assert resolve_attention_impl("xla", seq_len=99999) == "xla"
        with pytest.raises(ValueError):
            resolve_attention_impl("cudnn")

    def test_attention_wrapper_matches_oracle(self, rng_key):
        from mila_tpu.ops import dot_product_attention

        q = jax.random.normal(rng_key, (1, 16, 2, 8))
        k = jax.random.normal(jax.random.fold_in(rng_key, 1), (1, 16, 2, 8))
        v = jax.random.normal(jax.random.fold_in(rng_key, 2), (1, 16, 2, 8))
        import numpy as np

        np.testing.assert_allclose(
            attention(q, k, v, causal=True),
            dot_product_attention(q, k, v, causal=True),
            rtol=1e-5, atol=1e-6,
        )


class TestTimer:
    def test_scopes_accumulate(self):
        t = Timer()
        with t.scope("a"):
            pass
        with t.scope("a"):
            pass
        with t.scope("b", sync=jnp.zeros(4)):
            pass
        assert t.counts["a"] == 2 and t.counts["b"] == 1
        s = t.summary()
        assert "a" in s and "ms/call" in s

    def test_annotate_passthrough(self):
        @annotate("f")
        def f(x):
            return x + 1

        assert int(f(jnp.int32(1))) == 2
