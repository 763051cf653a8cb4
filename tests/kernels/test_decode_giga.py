"""Whole-model giga decode kernel (kernels/decode_giga.py): pack
bookkeeping + oracle-vs-model equivalence on CPU. The compiled kernel is
exercised on hardware by bench.py kernel_check (sec_giga) and
benchmarks/r5_giga.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference.quantize import quantize, quantize_model_params
from mila_tpu.kernels.decode_giga import GigaPack, giga_decode_step, pack_giga
from mila_tpu.models.llama import (
    Llama,
    LlamaConfig,
    add_quantized_lm_head,
    fuse_llama_projections,
    pack_decode_giga,
)

L, H, I, NH, NKV, HD = 2, 512, 1024, 8, 8, 64
KD, NQ = NKV * HD, NH * HD


def tiny_cfg(vocab=1000):
    return LlamaConfig(
        name="llama-giga-test", vocab_size=vocab, hidden_size=H,
        intermediate_size=I, num_layers=L, num_heads=NH, num_kv_heads=NKV,
        head_dim=HD, max_seq_len=128, rope_theta=10000.0,
        param_dtype="float32",
    )


def build_pack(dtype="int8"):
    key = jax.random.key(0)

    def q(k, shape):
        return quantize(
            jax.random.normal(jax.random.fold_in(key, k), shape) * 0.02,
            dtype)

    layers = [(q(10 * i, (NQ, H)), q(10 * i + 1, (H, 2 * I)),
               q(10 * i + 2, (I, H)), q(10 * i + 3, (H, NQ + 2 * KD)))
              for i in range(L)]
    head = q(99, (H, 1024))
    ga = jnp.ones((L, H)) + 0.1
    gm = jnp.ones((L, H)) - 0.1
    gf = jnp.ones((H,))
    return pack_giga(layers, head, ga, gm, gf, nh=NH, nkv=NKV, hd=HD,
                     vocab=1000)


def test_pack_giga_shapes():
    pack = build_pack()
    assert isinstance(pack, GigaPack)
    tpl = pack.n_wo + pack.n_gu + pack.n_down + pack.n_qkv
    assert (pack.n_wo, pack.n_gu, pack.n_down, pack.n_qkv) == (1, 4, 2, 3)
    ntot = pack.n_qkv + L * tpl - pack.n_qkv + pack.n_head
    assert pack.w.shape == (ntot, H, pack.bn)
    assert pack.s.shape == (ntot, 1, pack.bn)
    # 2 real head tiles + zero pad so the total stream divides by 8
    assert pack.n_head == 4
    assert ntot % 8 == 0
    assert float(jnp.abs(pack.w[-2:]).max()) == 0.0


def test_pack_giga_rejects_bad_shapes():
    # NKV*HD != bn -> no pack
    key = jax.random.key(0)
    wo = quantize(jax.random.normal(key, (NQ, H)) * 0.02, "int8")
    head = quantize(jax.random.normal(key, (H, 1024)) * 0.02, "int8")
    out = pack_giga([(wo, wo, wo, wo)], head, jnp.ones((1, H)),
                    jnp.ones((1, H)), jnp.ones((H,)), nh=NH, nkv=4, hd=HD,
                    vocab=1000)
    assert out is None


def test_giga_ref_runs_and_updates_cache():
    pack = build_pack()
    B, T = 2, 32
    key = jax.random.key(1)
    x = jax.random.normal(key, (B, H), jnp.bfloat16)
    lens = jnp.array([5, 17], jnp.int32)
    cos_t = jnp.ones((B, KD), jnp.float32)
    sin_t = jnp.zeros((B, KD), jnp.float32)
    kp = jnp.zeros((L, B, T, KD), jnp.bfloat16)
    vp = jnp.zeros((L, B, T, KD), jnp.bfloat16)
    tok, logits, kp2, vp2 = giga_decode_step(x, cos_t, sin_t, lens, pack,
                                             kp, vp, interpret=True)
    assert tok.shape == (B, 1) and tok.dtype == jnp.int32
    assert int(tok.max()) < 1000  # vocab mask respected (VPAD = 1024)
    assert logits.shape == (B, pack.n_head * pack.bn)
    # new rows landed at lens[b]
    for b, ln in enumerate([5, 17]):
        assert float(jnp.abs(kp2[0, b, ln]).sum()) > 0
        assert float(jnp.abs(kp2[0, b, ln + 1]).sum()) == 0
    assert kp2.shape == (L, B, T, KD)


def test_model_giga_step_matches_fallback():
    """model.giga_step (oracle path on CPU) vs the plain per-layer decode:
    same next token + close logits on a real (tiny) Llama pytree."""
    cfg = tiny_cfg()
    model = Llama(cfg)
    params = model.init(jax.random.key(0), (1, 8))
    qparams = pack_decode_giga(
        add_quantized_lm_head(
            quantize_model_params(fuse_llama_projections(params), "int8"),
            "int8", pad_to=1024),
        cfg)
    assert "giga_pack" in qparams

    B, T, pos = 2, 32, 7
    prompt = jax.random.randint(jax.random.key(1), (B, pos), 0,
                                cfg.vocab_size)
    cache = model.init_kv_cache(B, T)
    logits_p, cache = model.forward_with_cache(qparams, prompt, cache, 0)
    nxt = jnp.argmax(
        logits_p[:, -1, : cfg.vocab_size], -1).astype(jnp.int32)[:, None]

    # Fallback step (per-layer path, quantized weights)
    logits_f, _ = model.forward_with_cache(qparams, nxt, cache, pos)
    tok_f = jnp.argmax(logits_f[:, -1, : cfg.vocab_size], -1)

    kp, vp = model.stack_kv_cache(cache)
    lens = jnp.full((B,), pos, jnp.int32)
    tok_g, logits_g, kp, vp = model.giga_step(qparams, nxt, kp, vp, lens)

    np.testing.assert_array_equal(np.asarray(tok_g[:, 0]),
                                  np.asarray(tok_f))
    lf = np.asarray(logits_f[:, -1], np.float32)
    lg = np.asarray(logits_g, np.float32)
    np.testing.assert_allclose(lg, lf, rtol=8e-2, atol=8e-2)
    # cache rows written at pos for every layer
    nc = model.unstack_kv_cache(kp, vp)
    for i in range(cfg.num_layers):
        assert float(jnp.abs(nc[f"h{i}"]["k"][:, pos]).sum()) > 0


def test_giga_step_chain_is_finite():
    cfg = tiny_cfg()
    model = Llama(cfg)
    params = model.init(jax.random.key(0), (1, 8))
    qparams = pack_decode_giga(
        add_quantized_lm_head(
            quantize_model_params(fuse_llama_projections(params), "int8"),
            "int8", pad_to=1024),
        cfg)
    B, T = 2, 32
    cache = model.init_kv_cache(B, T)
    prompt = jax.random.randint(jax.random.key(2), (B, 4), 0, cfg.vocab_size)
    _, cache = model.forward_with_cache(qparams, prompt, cache, 0)
    kp, vp = model.stack_kv_cache(cache)
    tok = jnp.zeros((B, 1), jnp.int32)
    for step in range(3):
        lens = jnp.full((B,), 4 + step, jnp.int32)
        tok, logits, kp, vp = model.giga_step(qparams, tok, kp, vp, lens)
        assert np.isfinite(np.asarray(logits, np.float32)).all()
        assert int(tok.min()) >= 0 and int(tok.max()) < cfg.vocab_size
