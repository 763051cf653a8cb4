"""Contiguous-layout engine running the whole-model giga decode kernel
(kernels/decode_giga.py via InferenceEngine._use_giga_decode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference.engine import EngineConfig, InferenceEngine
from mila_tpu.inference.quantize import quantize_model_params
from mila_tpu.models.llama import (
    Llama,
    LlamaConfig,
    add_quantized_lm_head,
    fuse_llama_projections,
    pack_decode_giga,
)


@pytest.fixture(scope="module")
def giga_model():
    # Shapes satisfying the giga pack rules: NKV*HD == bn, head K == H.
    cfg = LlamaConfig(
        # vocab % 8 == 0: the giga token-mode embedding DMAs 8-row wte
        # blocks (production Llama vocabs are 8-aligned).
        name="llama-engine-giga", vocab_size=976, hidden_size=512,
        intermediate_size=1024, num_layers=2, num_heads=8, num_kv_heads=8,
        head_dim=64, max_seq_len=128, rope_theta=10000.0,
        param_dtype="float32",
    )
    model = Llama(cfg)
    params = model.init(jax.random.key(0), (1, 8))
    qparams = pack_decode_giga(
        add_quantized_lm_head(
            quantize_model_params(fuse_llama_projections(params), "int8"),
            "int8", pad_to=512),
        cfg)
    assert "giga_pack" in qparams
    return model, qparams, cfg


def test_engine_selects_giga_decode(giga_model):
    model, qparams, cfg = giga_model
    eng = InferenceEngine(
        model, qparams,
        EngineConfig(max_batch=2, max_len=64, prefill_buckets=(16,),
                     kv_layout="contiguous"),
    )
    assert eng._use_giga_decode()


def test_engine_giga_serves_requests(giga_model):
    model, qparams, cfg = giga_model
    eng = InferenceEngine(
        model, qparams,
        EngineConfig(max_batch=2, max_len=64, prefill_buckets=(16,),
                     kv_layout="contiguous", decode_chunk=4),
    )
    rng = np.random.default_rng(0)
    reqs = [
        eng.submit(rng.integers(0, cfg.vocab_size, n).astype(np.int32),
                   max_new_tokens=8)
        for n in (5, 11, 9)
    ]
    eng.run()
    for r in reqs:
        assert r.done
        assert len(r.output) == 8
        assert all(0 <= t < cfg.vocab_size for t in r.output)


def test_engine_giga_matches_paged_greedy(giga_model):
    """Greedy tokens from the giga-contiguous engine must match the plain
    contiguous (per-layer) engine on the same prompts."""
    model, qparams, cfg = giga_model
    prompts = [np.arange(1, 8, dtype=np.int32), np.arange(3, 15, dtype=np.int32)]

    def serve(params):
        eng = InferenceEngine(
            model, params,
            EngineConfig(max_batch=2, max_len=64, prefill_buckets=(16,),
                         kv_layout="contiguous", decode_chunk=4),
        )
        rs = [eng.submit(p, max_new_tokens=6) for p in prompts]
        eng.run()
        return [r.output for r in rs]

    giga_out = serve(qparams)
    plain = {k: v for k, v in qparams.items() if k != "giga_pack"}
    plain_out = serve(plain)
    # Quantized-stream vs per-layer numerics can flip near-ties on random
    # weights; require per-request first tokens to match and most tokens
    # overall to agree.
    total = agree = 0
    for g, p in zip(giga_out, plain_out):
        assert g[0] == p[0]
        total += len(g)
        agree += sum(1 for a, b in zip(g, p) if a == b)
    assert agree >= total - 2, (giga_out, plain_out)
