"""Llama model tests (GQA+RoPE+RMSNorm+SwiGLU — BASELINE stack)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference import Generator
from mila_tpu.models.llama import Llama, LlamaConfig


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = LlamaConfig.tiny(vocab_size=211)
    model = Llama(cfg)
    params = model.init(jax.random.key(0), (2, 16))
    return model, params, cfg


class TestLlamaForward:
    def test_logits_shape(self, tiny_llama):
        model, params, cfg = tiny_llama
        logits = model.apply(params, jnp.zeros((2, 12), jnp.int32))
        assert logits.shape == (2, 12, cfg.vocab_size)

    def test_param_structure_matches_hf_layout(self, tiny_llama):
        _, params, cfg = tiny_llama
        blk = params["h0"]
        assert set(blk) == {
            "ln_attn", "wq", "wk", "wv", "wo", "ln_mlp", "gate", "up", "down",
        }
        assert blk["wq"]["weight"].shape == (128, 4 * 32)
        assert blk["wk"]["weight"].shape == (128, 2 * 32)  # GQA: fewer KV heads
        assert "bias" not in blk["wq"]  # Llama has no attention biases

    def test_causality(self, tiny_llama):
        model, params, _ = tiny_llama
        toks = jax.random.randint(jax.random.key(3), (1, 10), 0, 211)
        l1 = model.apply(params, toks)
        l2 = model.apply(params, toks.at[0, 8:].set(0))
        np.testing.assert_allclose(l1[0, :8], l2[0, :8], rtol=1e-4, atol=1e-5)

    def test_position_sensitivity(self, tiny_llama):
        """Position information flows: the same token pattern at different
        positions yields different logits. (With identical tokens everywhere
        attention would average identical values, so alternate two tokens —
        RoPE + causal structure must separate positions 2 and 4.)"""
        model, params, _ = tiny_llama
        toks = jnp.tile(jnp.array([[5, 9]], jnp.int32), (1, 3))  # [5,9,5,9,5,9]
        logits = model.apply(params, toks)
        # Token 5 at positions 2 and 4: same token, different position/history.
        assert not np.allclose(logits[0, 2], logits[0, 4], rtol=1e-3)

    def test_llama32_1b_preset(self):
        cfg = LlamaConfig.llama32_1b()
        cfg.validate()
        assert cfg.num_kv_heads == 8 and cfg.hd == 64
        assert cfg.rope_scaling["rope_type"] == "llama3"


class TestLlamaKVCache:
    def test_incremental_matches_full(self, tiny_llama):
        model, params, cfg = tiny_llama
        toks = jax.random.randint(jax.random.key(4), (2, 10), 0, 211)
        full = model.apply(params, toks)
        cache = model.init_kv_cache(2, 32, jnp.float32)
        logits, cache = model.forward_with_cache(params, toks[:, :6], cache, 0)
        np.testing.assert_allclose(logits, full[:, :6], rtol=2e-3, atol=2e-4)
        for t in range(6, 10):
            lg, cache = model.forward_with_cache(params, toks[:, t:t + 1], cache, t)
            np.testing.assert_allclose(lg[:, 0], full[:, t], rtol=2e-3, atol=2e-4)

    def test_generator_greedy_matches_rollout(self, tiny_llama):
        model, params, cfg = tiny_llama
        gen = Generator(model, params, max_len=32, cache_dtype=jnp.float32)
        prompt = jnp.array([[9, 8, 7]], jnp.int32)
        out = gen.generate(prompt, 5)
        toks = prompt
        for _ in range(5):
            nxt = jnp.argmax(model.apply(params, toks)[:, -1], -1).astype(jnp.int32)
            toks = jnp.concatenate([toks, nxt[:, None]], 1)
        np.testing.assert_array_equal(out, toks)


class TestHFRoundTrip:
    def test_safetensors_to_llama_params(self, tmp_path, tiny_llama):
        """HF-named tensors → our params → identical forward."""
        from mila_tpu.serialization.safetensors_io import (
            hf_llama_to_params,
            load_safetensors,
            save_safetensors,
        )

        model, params, cfg = tiny_llama
        # Export our params under HF names (weights transposed to [out,in]).
        tensors = {
            "model.embed_tokens.weight": np.asarray(params["embed"]["wte"]),
            "model.norm.weight": np.asarray(params["norm_f"]["gamma"]),
        }
        for i in range(cfg.num_layers):
            b = params[f"h{i}"]
            pre = f"model.layers.{i}"
            tensors[f"{pre}.input_layernorm.weight"] = np.asarray(b["ln_attn"]["gamma"])
            tensors[f"{pre}.self_attn.q_proj.weight"] = np.asarray(b["wq"]["weight"]).T
            tensors[f"{pre}.self_attn.k_proj.weight"] = np.asarray(b["wk"]["weight"]).T
            tensors[f"{pre}.self_attn.v_proj.weight"] = np.asarray(b["wv"]["weight"]).T
            tensors[f"{pre}.self_attn.o_proj.weight"] = np.asarray(b["wo"]["weight"]).T
            tensors[f"{pre}.post_attention_layernorm.weight"] = np.asarray(b["ln_mlp"]["gamma"])
            tensors[f"{pre}.mlp.gate_proj.weight"] = np.asarray(b["gate"]["weight"]).T
            tensors[f"{pre}.mlp.up_proj.weight"] = np.asarray(b["up"]["weight"]).T
            tensors[f"{pre}.mlp.down_proj.weight"] = np.asarray(b["down"]["weight"]).T

        path = tmp_path / "model.safetensors"
        save_safetensors(path, tensors)
        loaded = hf_llama_to_params(load_safetensors(path), cfg.num_layers)

        toks = jnp.array([[1, 2, 3]], jnp.int32)
        l_orig = model.apply(params, toks)
        l_loaded = model.apply(jax.tree_util.tree_map(jnp.asarray, loaded), toks)
        np.testing.assert_allclose(l_orig, l_loaded, rtol=1e-5, atol=1e-6)


class TestFusedProjections:
    def test_fused_forward_matches(self, tiny_llama):
        from mila_tpu.models.llama import fuse_llama_projections

        model, params, cfg = tiny_llama
        fused = fuse_llama_projections(params)
        assert "wqkv" in fused["h0"] and "wq" not in fused["h0"]
        toks = jnp.array([[3, 1, 4, 1, 5]], jnp.int32)
        np.testing.assert_allclose(
            model.apply(params, toks), model.apply(fused, toks), rtol=1e-5, atol=1e-5
        )

    def test_fused_then_quantized(self, tiny_llama):
        from mila_tpu.inference.quantize import QTensor, quantize_model_params
        from mila_tpu.models.llama import fuse_llama_projections

        model, params, cfg = tiny_llama
        fused_q = quantize_model_params(fuse_llama_projections(params), "int8", min_size=1024)
        assert isinstance(fused_q["h0"]["wqkv"]["weight"], QTensor)
        toks = jnp.array([[7, 8, 9]], jnp.int32)
        l_ref = model.apply(params, toks)
        l_q = model.apply(fused_q, toks)
        probs_ref = jax.nn.softmax(l_ref)
        probs_q = jax.nn.softmax(l_q)
        assert float(jnp.abs(probs_ref - probs_q).max()) < 0.05

    def test_fused_cache_decode_matches(self, tiny_llama):
        from mila_tpu.models.llama import fuse_llama_projections

        model, params, cfg = tiny_llama
        fused = fuse_llama_projections(params)
        toks = jnp.array([[2, 4, 6]], jnp.int32)
        cache1 = model.init_kv_cache(1, 16, jnp.float32)
        cache2 = model.init_kv_cache(1, 16, jnp.float32)
        l1, _ = model.forward_with_cache(params, toks, cache1, 0)
        l2, _ = model.forward_with_cache(fused, toks, cache2, 0)
        np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-5)

    def test_mlp_pack_decode_matches(self, tiny_llama):
        from mila_tpu.inference.quantize import quantize_model_params
        from mila_tpu.models.llama import fuse_llama_projections, pack_decode_mlp

        model, params, cfg = tiny_llama
        fused_q = quantize_model_params(
            fuse_llama_projections(params), "int8", min_size=1024
        )
        packed = pack_decode_mlp(fused_q)
        assert "mlp_pack" in packed["h0"]
        toks = jnp.array([[2, 4, 6], [1, 3, 5]], jnp.int32)
        cache1 = model.init_kv_cache(2, 16, jnp.float32)
        cache2 = model.init_kv_cache(2, 16, jnp.float32)
        l1, c1 = model.forward_with_cache(fused_q, toks, cache1, 0)
        l2, c2 = model.forward_with_cache(packed, toks, cache2, 0)
        # Prefill (M > 32 threshold not hit here: 2*3=6 <= 32 uses the fused
        # decode path in both) — compare decode steps too.
        np.testing.assert_allclose(
            np.asarray(l1, np.float32), np.asarray(l2, np.float32),
            rtol=2e-2, atol=2e-2,
        )
        nxt = jnp.array([[7], [9]], jnp.int32)
        d1, _ = model.forward_with_cache(fused_q, nxt, c1, 3)
        d2, _ = model.forward_with_cache(packed, nxt, c2, 3)
        np.testing.assert_allclose(
            np.asarray(d1, np.float32), np.asarray(d2, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_layer_pack_decode_matches(self, tiny_llama):
        """Whole-layer megakernel decode path vs the unpacked quantized
        model (kernels/layer_fused.py wiring in _backbone_fused_decode)."""
        from mila_tpu.inference.quantize import quantize_model_params
        from mila_tpu.models.llama import (
            fuse_llama_projections, pack_decode_layers,
        )

        model, params, cfg = tiny_llama
        fused_q = quantize_model_params(
            fuse_llama_projections(params), "int8", min_size=1024
        )
        packed = pack_decode_layers(fused_q, bn=128)
        assert "layer_stream" in packed
        assert packed["layer_stream"].n_layers == cfg.num_layers
        assert packed["layer_stream"].n_qkv > 0
        toks = jnp.array([[2, 4, 6], [1, 3, 5]], jnp.int32)
        cache1 = model.init_kv_cache(2, 16, jnp.float32)
        cache2 = model.init_kv_cache(2, 16, jnp.float32)
        _, c1 = model.forward_with_cache(fused_q, toks, cache1, 0)
        _, c2 = model.forward_with_cache(packed, toks, cache2, 0)
        nxt = jnp.array([[7], [9]], jnp.int32)
        d1, c1b = model.forward_with_cache(fused_q, nxt, c1, 3)
        d2, c2b = model.forward_with_cache(packed, nxt, c2, 3)
        np.testing.assert_allclose(
            np.asarray(d1, np.float32), np.asarray(d2, np.float32),
            rtol=3e-2, atol=3e-2,
        )
        # Caches stayed in sync through the fused step (stacked [L,B,T,...]).
        np.testing.assert_allclose(
            np.asarray(c1b["h0"]["k"], np.float32),
            np.asarray(c2b["h0"]["k"], np.float32), rtol=2e-2, atol=2e-2,
        )
        # And another fused step chains off the fused cache.
        d3, _ = model.forward_with_cache(packed, nxt, c2b, 4)
        d3_ref, _ = model.forward_with_cache(fused_q, nxt, c1b, 4)
        np.testing.assert_allclose(
            np.asarray(d3, np.float32), np.asarray(d3_ref, np.float32),
            rtol=3e-2, atol=3e-2,
        )

    def test_quantized_lm_head(self, tiny_llama):
        from mila_tpu.models.llama import add_quantized_lm_head

        model, params, cfg = tiny_llama
        qp = add_quantized_lm_head(params)
        toks = jnp.array([[1, 2, 3]], jnp.int32)
        l_ref = model.apply(params, toks)
        l_q = model.apply(qp, toks)
        p_ref = jax.nn.softmax(l_ref)
        p_q = jax.nn.softmax(l_q)
        assert float(jnp.abs(p_ref - p_q).max()) < 0.03


class TestMegaDecode:
    def test_mega_decode_matches_quantized(self, tiny_llama):
        """Single-kernel-per-layer decode (kernels/layer_mega.py, CPU
        oracle path) vs the unpacked quantized model, including slot
        permutation of wq columns / wo rows and the cache write-back."""
        from mila_tpu.inference.quantize import quantize_model_params
        from mila_tpu.models.llama import (
            fuse_llama_projections, pack_decode_megalayers,
        )

        model, params, cfg = tiny_llama
        fused_q = quantize_model_params(
            fuse_llama_projections(params), "int8", min_size=1024
        )
        packed = pack_decode_megalayers(fused_q, cfg, bn=64)
        assert "mega_pack" in packed["h0"], "mega pack must build"
        assert "wqkv_slot" in packed["h0"]
        toks = jnp.array([[2, 4, 6], [1, 3, 5]], jnp.int32)
        cache1 = model.init_kv_cache(2, 16, jnp.float32)
        cache2 = model.init_kv_cache(2, 16, jnp.float32)
        _, c1 = model.forward_with_cache(fused_q, toks, cache1, 0)
        _, c2 = model.forward_with_cache(packed, toks, cache2, 0)
        nxt = jnp.array([[7], [9]], jnp.int32)
        d1, c1b = model.forward_with_cache(fused_q, nxt, c1, 3)
        d2, c2b = model.forward_with_cache(packed, nxt, c2, 3)
        np.testing.assert_allclose(
            np.asarray(d1, np.float32), np.asarray(d2, np.float32),
            rtol=3e-2, atol=3e-2,
        )
        np.testing.assert_allclose(
            np.asarray(c1b["h0"]["k"], np.float32),
            np.asarray(c2b["h0"]["k"], np.float32), rtol=2e-2, atol=2e-2,
        )
        # chains off the mega cache
        d3, _ = model.forward_with_cache(packed, nxt, c2b, 4)
        d3_ref, _ = model.forward_with_cache(fused_q, nxt, c1b, 4)
        np.testing.assert_allclose(
            np.asarray(d3, np.float32), np.asarray(d3_ref, np.float32),
            rtol=3e-2, atol=3e-2,
        )

    def test_mega_ragged_matches(self, tiny_llama):
        from mila_tpu.inference.quantize import quantize_model_params
        from mila_tpu.models.llama import (
            fuse_llama_projections, pack_decode_megalayers,
        )

        model, params, cfg = tiny_llama
        fused_q = quantize_model_params(
            fuse_llama_projections(params), "int8", min_size=1024
        )
        packed = pack_decode_megalayers(fused_q, cfg, bn=64)
        toks = jnp.array([[2, 4, 6, 1], [1, 3, 5, 2]], jnp.int32)
        cache1 = model.init_kv_cache(2, 16, jnp.float32)
        cache2 = model.init_kv_cache(2, 16, jnp.float32)
        _, c1 = model.forward_with_cache(fused_q, toks, cache1, 0)
        _, c2 = model.forward_with_cache(packed, toks, cache2, 0)
        positions = jnp.array([4, 4], jnp.int32)
        nxt = jnp.array([[7], [9]], jnp.int32)
        l1, _ = model.forward_with_cache_ragged(fused_q, nxt, c1, positions)
        l2, _ = model.forward_with_cache_ragged(packed, nxt, c2, positions)
        np.testing.assert_allclose(
            np.asarray(l1, np.float32), np.asarray(l2, np.float32),
            rtol=3e-2, atol=3e-2,
        )
