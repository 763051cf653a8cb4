"""Speculative decoding tests: greedy equivalence, full acceptance when
draft == target, sampling validity, cache rewind across rejections."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference import Generator, SamplingConfig, SpeculativeGenerator
from mila_tpu.models.gpt2 import GPT2, GPT2Config


@pytest.fixture(scope="module")
def target_model():
    cfg = GPT2Config(
        vocab_size=61, max_seq_len=128, num_layers=3, num_heads=2,
        embedding_dim=32,
    )
    model = GPT2(cfg)
    return model, model.init(jax.random.key(0), (1, 16))


@pytest.fixture(scope="module")
def draft_model():
    cfg = GPT2Config(
        vocab_size=61, max_seq_len=128, num_layers=1, num_heads=2,
        embedding_dim=16,
    )
    model = GPT2(cfg)
    return model, model.init(jax.random.key(7), (1, 16))


class TestSpeculativeGreedy:
    @pytest.mark.parametrize("k", [1, 3, 4])
    def test_matches_target_greedy(self, target_model, draft_model, k):
        """Greedy speculative output == plain greedy target output, for any
        draft (acceptance only changes speed, never the stream)."""
        tm, tp = target_model
        dm, dp = draft_model
        prompt = jnp.array([[5, 9, 13, 2]], jnp.int32)
        plain = Generator(tm, tp, max_len=128, cache_dtype=jnp.float32)
        expected = np.asarray(plain.generate(prompt, 24))
        spec = SpeculativeGenerator(tm, tp, dm, dp, k=k, max_len=128,
                                    cache_dtype=jnp.float32)
        got = np.asarray(spec.generate(prompt, 24))
        np.testing.assert_array_equal(got, expected)
        assert spec.stats["rounds"] >= 1

    def test_draft_equals_target_accepts_everything(self, target_model):
        tm, tp = target_model
        spec = SpeculativeGenerator(tm, tp, tm, tp, k=4, max_len=128,
                                    cache_dtype=jnp.float32)
        prompt = jnp.array([[1, 2, 3]], jnp.int32)
        spec.generate(prompt, 20)
        assert spec.acceptance_rate == 1.0

    def test_rejections_recover(self, target_model, draft_model):
        """A weak draft gets rejected; the stream must still be exact (cache
        rewind correctness across many rejection boundaries)."""
        tm, tp = target_model
        dm, dp = draft_model
        prompt = jnp.array([[11]], jnp.int32)
        plain = Generator(tm, tp, max_len=128, cache_dtype=jnp.float32)
        expected = np.asarray(plain.generate(prompt, 40))
        spec = SpeculativeGenerator(tm, tp, dm, dp, k=4, max_len=128,
                                    cache_dtype=jnp.float32)
        got = np.asarray(spec.generate(prompt, 40))
        np.testing.assert_array_equal(got, expected)
        # random draft: some rejection must have happened
        assert spec.acceptance_rate < 1.0


class TestSpeculativeSampling:
    def test_draft_equals_target_never_rejects(self, target_model):
        """p == q → acceptance ratio 1 → everything accepted."""
        tm, tp = target_model
        spec = SpeculativeGenerator(tm, tp, tm, tp, k=3, max_len=128,
                                    cache_dtype=jnp.float32)
        prompt = jnp.array([[4, 5]], jnp.int32)
        out = spec.generate(
            prompt, 15, key=jax.random.key(3),
            sampling=SamplingConfig(greedy=False, temperature=1.0),
        )
        assert spec.acceptance_rate == 1.0
        assert out.shape == (1, 2 + 15)
        assert int(out.max()) < 61 and int(out.min()) >= 0

    def test_sampled_tokens_in_vocab(self, target_model, draft_model):
        tm, tp = target_model
        dm, dp = draft_model
        spec = SpeculativeGenerator(tm, tp, dm, dp, k=4, max_len=128,
                                    cache_dtype=jnp.float32)
        out = spec.generate(
            jnp.array([[7, 8]], jnp.int32), 20, key=jax.random.key(5),
            sampling=SamplingConfig(greedy=False, temperature=0.8),
        )
        toks = np.asarray(out)[0]
        assert ((0 <= toks) & (toks < 61)).all()


class TestSpeculativeEdges:
    def test_eos_stops(self, target_model, draft_model):
        tm, tp = target_model
        dm, dp = draft_model
        plain = Generator(tm, tp, max_len=128, cache_dtype=jnp.float32)
        ref = np.asarray(plain.generate(jnp.array([[5]], jnp.int32), 10))[0]
        eos = int(ref[3])  # third generated token as eos
        spec = SpeculativeGenerator(tm, tp, dm, dp, k=4, max_len=128,
                                    cache_dtype=jnp.float32)
        out = np.asarray(
            spec.generate(jnp.array([[5]], jnp.int32), 10, eos_token=eos)
        )[0]
        gen = list(out[1:])
        assert eos in gen
        first_eos = gen.index(eos)
        assert all(t == eos for t in gen[first_eos:])

    def test_batch_gt1_rejected(self, target_model, draft_model):
        tm, tp = target_model
        dm, dp = draft_model
        spec = SpeculativeGenerator(tm, tp, dm, dp, k=2, max_len=128)
        with pytest.raises(ValueError, match="B=1"):
            spec.generate(jnp.zeros((2, 4), jnp.int32), 4)

    def test_overflow_rejected(self, target_model, draft_model):
        tm, tp = target_model
        dm, dp = draft_model
        spec = SpeculativeGenerator(tm, tp, dm, dp, k=2, max_len=32)
        with pytest.raises(ValueError, match="exceeds"):
            spec.generate(jnp.zeros((1, 20), jnp.int32), 20)
