"""MLP megakernel vs jnp oracle (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference.quantize import quantize
from mila_tpu.kernels.decode_mlp import mlp_block_fused, mlp_block_ref, pack_mlp


def _data(key, M, H, I, dtype="int8"):
    ks = jax.random.split(key, 5)
    att = jax.random.normal(ks[0], (M, H), jnp.bfloat16)
    x = jax.random.normal(ks[1], (M, H), jnp.bfloat16)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[2], (H,), jnp.float32)
    wo = quantize(jax.random.normal(ks[3], (H, H)) * 0.05, dtype)
    wgu = quantize(jax.random.normal(ks[4], (H, 2 * I)) * 0.05, dtype)
    down = quantize(jax.random.normal(ks[0], (I, H)) * 0.05, dtype)
    return att, x, gamma, wo, wgu, down


@pytest.mark.parametrize("M", [1, 8, 32])
@pytest.mark.parametrize("dtype", ["int8", "fp8_e4m3"])
def test_megakernel_matches_oracle(M, dtype):
    H, I = 256, 512
    att, x, gamma, wo, wgu, down = _data(jax.random.key(0), M, H, I, dtype)
    pack = pack_mlp(wo, wgu, down, bn=128)
    assert pack is not None
    assert pack.n_wo == 2 and pack.n_gu == 8 and pack.n_down == 4
    got = mlp_block_fused(att, x, gamma, pack, eps=1e-5)
    want = mlp_block_ref(att, x, gamma, wo, wgu, down, eps=1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_bn_equal_h():
    # bn == H: single wo tile, single down column (the Llama-1B default path)
    H, I = 256, 512
    att, x, gamma, wo, wgu, down = _data(jax.random.key(1), 8, H, I)
    pack = pack_mlp(wo, wgu, down, bn=256)
    assert pack is not None
    assert pack.n_wo == 1 and pack.n_gu == 4 and pack.n_down == 2
    got = mlp_block_fused(att, x, gamma, pack)
    want = mlp_block_ref(att, x, gamma, wo, wgu, down)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_pack_rejects_bad_shapes():
    H, I = 256, 384  # I % H != 0
    att, x, gamma, wo, wgu, down = _data(jax.random.key(2), 8, H, I)
    assert pack_mlp(wo, wgu, down) is None


def test_pack_rejects_int4():
    H, I = 256, 512
    _, _, _, wo, wgu, down = _data(jax.random.key(3), 8, H, I)
    wo4 = quantize(jax.random.normal(jax.random.key(4), (H, H)) * 0.05, "int4")
    assert pack_mlp(wo4, wgu, down) is None


def test_leading_dims_and_m_cap():
    H, I = 256, 512
    att, x, gamma, wo, wgu, down = _data(jax.random.key(5), 8, H, I)
    pack = pack_mlp(wo, wgu, down, bn=128)
    got3 = mlp_block_fused(att.reshape(4, 2, H), x.reshape(4, 2, H), gamma, pack)
    assert got3.shape == (4, 2, H)
    big = jnp.zeros((64, H), jnp.bfloat16)
    with pytest.raises(ValueError):
        mlp_block_fused(big, big, gamma, pack)
