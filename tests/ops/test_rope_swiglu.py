"""RoPE + SwiGLU tests (BASELINE dev-branch capabilities)."""

import jax
import jax.numpy as jnp
import numpy as np

from mila_tpu.ops import (
    apply_rope,
    apply_rope_interleaved,
    rope_cos_sin,
    silu,
    swiglu,
)


class TestRope:
    def test_position_zero_is_identity(self, rng_key):
        x = jax.random.normal(rng_key, (1, 1, 4, 16))
        cos, sin = rope_cos_sin(jnp.zeros((1, 1), jnp.int32), 16)
        np.testing.assert_allclose(apply_rope(x, cos, sin), x, rtol=1e-6)

    def test_norm_preserved(self, rng_key):
        """Rotation must preserve per-head vector norms."""
        x = jax.random.normal(rng_key, (2, 8, 4, 32))
        pos = jnp.arange(8)[None].repeat(2, 0)
        cos, sin = rope_cos_sin(pos, 32)
        y = apply_rope(x, cos, sin)
        np.testing.assert_allclose(
            jnp.linalg.norm(y, axis=-1), jnp.linalg.norm(x, axis=-1), rtol=1e-5
        )

    def test_relative_property(self, rng_key):
        """<rope(q,m), rope(k,n)> depends only on m−n (per pair dims)."""
        k1, k2 = jax.random.split(rng_key)
        d = 16
        q = jax.random.normal(k1, (1, 1, 1, d))
        k = jax.random.normal(k2, (1, 1, 1, d))

        def dot_at(m, n):
            cq, sq = rope_cos_sin(jnp.array([[m]]), d)
            ck, sk = rope_cos_sin(jnp.array([[n]]), d)
            return jnp.sum(apply_rope(q, cq, sq) * apply_rope(k, ck, sk))

        np.testing.assert_allclose(dot_at(5, 3), dot_at(10, 8), rtol=1e-4)
        np.testing.assert_allclose(dot_at(7, 7), dot_at(0, 0), rtol=1e-4)

    def test_interleaved_norm_preserved(self, rng_key):
        x = jax.random.normal(rng_key, (1, 4, 2, 8))
        pos = jnp.arange(4)[None]
        cos, sin = rope_cos_sin(pos, 8)
        y = apply_rope_interleaved(x, cos, sin)
        np.testing.assert_allclose(
            jnp.linalg.norm(y, axis=-1), jnp.linalg.norm(x, axis=-1), rtol=1e-5
        )

    def test_llama3_scaling_changes_low_freqs(self):
        from mila_tpu.ops.rope import rope_frequencies

        base = rope_frequencies(64)
        scaled = rope_frequencies(
            64,
            scaling={
                "rope_type": "llama3",
                "factor": 8.0,
                "low_freq_factor": 1.0,
                "high_freq_factor": 4.0,
                "original_max_position_embeddings": 8192,
            },
        )
        # High-frequency components unchanged; low-frequency scaled down.
        np.testing.assert_allclose(scaled[0], base[0], rtol=1e-6)
        assert scaled[-1] < base[-1]


class TestSwiGLU:
    def test_forward(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        g = jax.random.normal(k1, (4, 16))
        u = jax.random.normal(k2, (4, 16))
        np.testing.assert_allclose(swiglu(g, u), silu(g) * u, rtol=1e-6)

    def test_backward_matches_autodiff(self, rng_key):
        k1, k2, k3 = jax.random.split(rng_key, 3)
        g = jax.random.normal(k1, (4, 16))
        u = jax.random.normal(k2, (4, 16))
        ct = jax.random.normal(k3, (4, 16))
        gm = jax.grad(lambda g, u: jnp.sum(swiglu(g, u) * ct), argnums=(0, 1))(g, u)
        ga = jax.grad(lambda g, u: jnp.sum(silu(g) * u * ct), argnums=(0, 1))(g, u)
        for m, a in zip(gm, ga):
            np.testing.assert_allclose(m, a, rtol=1e-4, atol=1e-5)
