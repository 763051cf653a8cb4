"""Layer-tail megakernel (wo|rms|SwiGLU|down + next wqkv) vs the unfused
oracle chain.

Parity anchor: one weight stream per layer tail replaces the reference's
per-Linear cuBLASLt plans (CudaLinearOp.ixx:147-225).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference.quantize import quant_linear_ref, quantize
from mila_tpu.kernels.layer_fused import mlp_qkv_fused, pack_layer
from mila_tpu.ops.rmsnorm import rms_norm
from mila_tpu.ops.swiglu import swiglu


def _oracle(att, x, gm_mlp, wo, wgu, down, wqkv, gm_nxt, eps):
    x1 = (quant_linear_ref(att, wo).astype(jnp.float32)
          + x.astype(jnp.float32)).astype(x.dtype)
    gu = quant_linear_ref(rms_norm(x1, gm_mlp, eps), wgu)
    g, u = jnp.split(gu, 2, axis=-1)
    x_out = (quant_linear_ref(swiglu(g, u), down).astype(jnp.float32)
             + x1.astype(jnp.float32)).astype(x.dtype)
    qkv = None
    if wqkv is not None:
        qkv = quant_linear_ref(rms_norm(x_out, gm_nxt, eps), wqkv)
    return x_out, qkv


@pytest.mark.parametrize("with_qkv", [True, False])
def test_layer_tail_matches_oracle(with_qkv):
    key = jax.random.key(0)
    B, H, I, Nq = 2, 512, 1024, 768
    eps = 1e-5
    ks = jax.random.split(key, 8)
    att = jax.random.normal(ks[0], (B, H), jnp.bfloat16)
    x = jax.random.normal(ks[1], (B, H), jnp.bfloat16)
    gm_mlp = 1.0 + 0.1 * jax.random.normal(ks[2], (H,), jnp.float32)
    gm_nxt = 1.0 + 0.1 * jax.random.normal(ks[3], (H,), jnp.float32)
    wo = quantize(jax.random.normal(ks[4], (H, H)) * 0.05, "int8")
    wgu = quantize(jax.random.normal(ks[5], (H, 2 * I)) * 0.05, "int8")
    down = quantize(jax.random.normal(ks[6], (I, H)) * 0.05, "int8")
    wqkv = (quantize(jax.random.normal(ks[7], (H, Nq)) * 0.05, "int8")
            if with_qkv else None)

    pack = pack_layer(wo, wgu, down, wqkv, bn=256)
    assert pack is not None
    assert pack.n_qkv == (Nq // 256 if with_qkv else 0)

    x_out, qkv = mlp_qkv_fused(
        att, x, gm_mlp, pack, gm_nxt if with_qkv else None, eps=eps
    )
    x_ref, qkv_ref = _oracle(att, x, gm_mlp, wo, wgu, down, wqkv,
                             gm_nxt, eps)
    np.testing.assert_allclose(
        np.asarray(x_out, np.float32), np.asarray(x_ref, np.float32),
        rtol=6e-2, atol=6e-1,
    )
    if with_qkv:
        assert qkv is not None and qkv.shape == (B, Nq)
        np.testing.assert_allclose(
            np.asarray(qkv, np.float32), np.asarray(qkv_ref, np.float32),
            rtol=8e-2, atol=8e-1,
        )
    else:
        assert qkv is None


def test_layer_tail_3d_shapes():
    """[B, 1, H] shapes round-trip (the model's decode calling convention)."""
    key = jax.random.key(1)
    B, H, I, Nq = 2, 256, 256, 512
    ks = jax.random.split(key, 6)
    att = jax.random.normal(ks[0], (B, 1, H), jnp.bfloat16)
    x = jax.random.normal(ks[1], (B, 1, H), jnp.bfloat16)
    gm = jnp.ones((H,), jnp.float32)
    wo = quantize(jax.random.normal(ks[2], (H, H)) * 0.05, "int8")
    wgu = quantize(jax.random.normal(ks[3], (H, 2 * I)) * 0.05, "int8")
    down = quantize(jax.random.normal(ks[4], (I, H)) * 0.05, "int8")
    wqkv = quantize(jax.random.normal(ks[5], (H, Nq)) * 0.05, "int8")
    pack = pack_layer(wo, wgu, down, wqkv, bn=128)
    assert pack is not None
    x_out, qkv = mlp_qkv_fused(att, x, gm, pack, gm)
    assert x_out.shape == (B, 1, H)
    assert qkv.shape == (B, 1, Nq)


def test_pack_layer_rejects_bad_shapes():
    wo = quantize(jnp.ones((256, 256)) * 0.01, "int8")
    wgu = quantize(jnp.ones((256, 1024)) * 0.01, "int8")
    down = quantize(jnp.ones((512, 256)) * 0.01, "int8")
    bad_qkv = quantize(jnp.ones((256, 300)) * 0.01, "int8")  # 300 % bn != 0
    assert pack_layer(wo, wgu, down, bad_qkv, bn=256) is None
    assert pack_layer(wo, wgu, down, None, bn=256) is not None
