"""Fused greedy head (rms + quant matmul + argmax epilogue) vs oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference.quantize import quant_linear_ref, quantize
from mila_tpu.kernels.decode_fused import rms_quant_linear_argmax
from mila_tpu.ops.rmsnorm import rms_norm


@pytest.mark.parametrize("M,vocab", [(1, 1000), (8, 1024), (8, 900)])
def test_matches_unfused_argmax(M, vocab):
    K, N = 256, 1024  # N = padded vocab
    key = jax.random.key(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    gamma = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (K,))
    w = jax.random.normal(jax.random.fold_in(key, 2), (K, N)) * 0.05
    qt = quantize(w, "int8")
    tok = rms_quant_linear_argmax(x, gamma, qt, vocab_size=vocab)
    assert tok is not None and tok.shape == (M, 1)
    logits = quant_linear_ref(
        rms_norm(x, gamma, 1e-5), qt, compute_dtype=jnp.float32
    ).astype(jnp.float32)[:, :vocab]
    want = jnp.argmax(logits, axis=-1)
    np.testing.assert_array_equal(np.asarray(tok)[:, 0], np.asarray(want))


def test_falls_back_none_for_prefill_shapes():
    K, N = 256, 1024
    x = jnp.zeros((64, K), jnp.bfloat16)  # M > 32
    qt = quantize(jnp.ones((K, N)), "int8")
    assert rms_quant_linear_argmax(x, jnp.ones((K,)), qt, vocab_size=N) is None


def test_greedy_step_with_cache(tiny_llama_quant):
    model, params, qparams, cfg = tiny_llama_quant
    toks = jnp.array([[1, 2, 3], [4, 5, 6]], jnp.int32)
    cache = model.init_kv_cache(2, 16, jnp.float32)
    logits, cache = model.forward_with_cache(qparams, toks, cache, 0)
    want = jnp.argmax(logits[:, -1, : cfg.vocab_size], -1)
    nxt = want.astype(jnp.int32)[:, None]
    tok_f, cache_f = model.greedy_step_with_cache(qparams, nxt, dict(cache), 3)
    logits2, _ = model.forward_with_cache(qparams, nxt, cache, 3)
    want2 = jnp.argmax(
        logits2[:, -1, : cfg.vocab_size].astype(jnp.float32), -1
    ).astype(jnp.int32)[:, None]
    np.testing.assert_array_equal(np.asarray(tok_f), np.asarray(want2))


@pytest.fixture()
def tiny_llama_quant():
    from mila_tpu.inference.quantize import quantize_model_params
    from mila_tpu.models.llama import (
        Llama, LlamaConfig, add_quantized_lm_head, fuse_llama_projections,
    )

    cfg = LlamaConfig.tiny(vocab_size=500)
    model = Llama(cfg)
    params = model.init(jax.random.key(0), (1, 8))
    qparams = add_quantized_lm_head(
        quantize_model_params(fuse_llama_projections(params), "int8",
                              min_size=1024),
        "int8", pad_to=128,
    )
    return model, params, qparams, cfg
