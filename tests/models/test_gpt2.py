"""GPT-2 model tests (mirrors Tests/Dnn/Models/Gpt2/ + the Gpt2Model
forward/generation behavior; KV-cache correctness is new TPU coverage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference import Generator, SamplingConfig
from mila_tpu.models.gpt2 import GPT2, GPT2Config


@pytest.fixture(scope="module")
def tiny_gpt2():
    cfg = GPT2Config(
        name="tiny",
        vocab_size=97,  # deliberately unaligned → tests Vp padding
        max_seq_len=32,
        num_layers=2,
        num_heads=2,
        embedding_dim=32,
    )
    model = GPT2(cfg)
    params = model.init(jax.random.key(0), (2, 16))
    return model, params, cfg


class TestGPT2Forward:
    def test_vp_padding(self, tiny_gpt2):
        _, _, cfg = tiny_gpt2
        assert cfg.vp == 128  # 97 rounded to lane multiple

    def test_logits_shape(self, tiny_gpt2):
        model, params, cfg = tiny_gpt2
        tokens = jnp.zeros((2, 16), jnp.int32)
        logits = model.apply(params, tokens)
        assert logits.shape == (2, 16, cfg.vp)

    def test_param_structure(self, tiny_gpt2):
        model, params, _ = tiny_gpt2
        assert set(params) == {"encoder", "h0", "h1", "ln_f"}
        assert params["encoder"]["wte"].shape == (128, 32)
        assert params["encoder"]["wpe"].shape == (32, 32)

    def test_tied_embeddings_no_head(self, tiny_gpt2):
        model, params, _ = tiny_gpt2
        assert "lm_head" not in params

    def test_causality(self, tiny_gpt2):
        model, params, _ = tiny_gpt2
        k = jax.random.key(1)
        toks = jax.random.randint(k, (1, 10), 0, 97)
        l1 = model.apply(params, toks)
        toks2 = toks.at[0, 7:].set(3)
        l2 = model.apply(params, toks2)
        np.testing.assert_allclose(l1[0, :7], l2[0, :7], rtol=1e-4, atol=1e-5)

    def test_untied_head(self, rng_key):
        cfg = GPT2Config(vocab_size=64, max_seq_len=8, num_layers=1, num_heads=2,
                         embedding_dim=16, tie_embeddings=False)
        model = GPT2(cfg)
        params = model.init(rng_key, (1, 8))
        assert "lm_head" in params
        assert model.apply(params, jnp.zeros((1, 8), jnp.int32)).shape == (1, 8, cfg.vp)


class TestKVCache:
    def test_incremental_matches_full_forward(self, tiny_gpt2):
        """Prefill+decode through the cache must equal the full forward —
        the core KV-cache correctness invariant."""
        model, params, cfg = tiny_gpt2
        toks = jax.random.randint(jax.random.key(2), (2, 12), 0, 97)
        full = model.apply(params, toks)

        cache = model.init_kv_cache(2, 32)
        # Prefill on the first 8, then decode 4 tokens one at a time.
        logits, cache = model.forward_with_cache(params, toks[:, :8], cache, 0)
        np.testing.assert_allclose(logits, full[:, :8], rtol=2e-3, atol=2e-4)
        for t in range(8, 12):
            step_logits, cache = model.forward_with_cache(
                params, toks[:, t:t + 1], cache, t
            )
            np.testing.assert_allclose(
                step_logits[:, 0], full[:, t], rtol=2e-3, atol=2e-4
            )

    def test_cache_shapes(self, tiny_gpt2):
        model, _, cfg = tiny_gpt2
        cache = model.init_kv_cache(3, 16)
        assert set(cache) == {"h0", "h1"}
        assert cache["h0"]["k"].shape == (3, 16, 2, 16)


class TestGenerator:
    def test_greedy_deterministic(self, tiny_gpt2):
        model, params, _ = tiny_gpt2
        gen = Generator(model, params, max_len=32)
        prompt = jnp.array([[5, 10, 15]], jnp.int32)
        out1 = gen.generate(prompt, 8)
        out2 = gen.generate(prompt, 8)
        assert out1.shape == (1, 11)
        np.testing.assert_array_equal(out1, out2)
        np.testing.assert_array_equal(out1[:, :3], prompt)
        # Sampled ids stay inside the real vocab (never the Vp padding).
        assert int(out1.max()) < 97

    def test_greedy_matches_full_forward_argmax(self, tiny_gpt2):
        """Generation through the cache must equal naive argmax-rollout via
        the full forward (the reference's no-cache approach)."""
        model, params, cfg = tiny_gpt2
        prompt = jnp.array([[1, 2, 3, 4]], jnp.int32)
        gen = Generator(model, params, max_len=32)
        out = gen.generate(prompt, 6)

        toks = prompt
        for _ in range(6):
            logits = model.apply(params, toks)[:, -1, :97]
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
            toks = jnp.concatenate([toks, nxt], axis=1)
        np.testing.assert_array_equal(out, toks)

    def test_sampling_configs(self, tiny_gpt2):
        model, params, _ = tiny_gpt2
        gen = Generator(model, params, max_len=32)
        prompt = jnp.array([[7]], jnp.int32)
        for cfg_s in [
            SamplingConfig(temperature=0.8),
            SamplingConfig(top_k=5),
            SamplingConfig(top_p=0.9),
        ]:
            out = gen.generate(prompt, 5, key=jax.random.key(0), sampling=cfg_s)
            assert out.shape == (1, 6) and int(out.max()) < 97

    def test_overflow_raises(self, tiny_gpt2):
        model, params, _ = tiny_gpt2
        gen = Generator(model, params, max_len=16)
        with pytest.raises(ValueError, match="exceeds"):
            gen.generate(jnp.zeros((1, 10), jnp.int32), 10)


class TestCharLMConfig:
    def test_char_preset(self):
        cfg = GPT2Config.char_lm(vocab_size=70)
        cfg.validate()
        assert cfg.embedding_dim == 256 and cfg.num_layers == 4
