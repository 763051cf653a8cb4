"""Speculative decoding integrated into the paged continuous-batching engine
(VERDICT item 8 / coverage row 52): greedy spec streams must equal the
target-only streams token-for-token, across acceptance rates, batching,
EOS, and page pressure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference import SamplingConfig
from mila_tpu.inference.engine import EngineConfig, InferenceEngine
from mila_tpu.models.llama import Llama, LlamaConfig


@pytest.fixture(scope="module")
def target():
    cfg = LlamaConfig.tiny(vocab_size=61)
    model = Llama(cfg)
    params = model.init(jax.random.key(0), (1, 16))
    return model, params


@pytest.fixture(scope="module")
def draft_same(target):
    """Draft == target: every proposal accepted."""
    return target


@pytest.fixture(scope="module")
def draft_other():
    """Differently-initialized draft: frequent rejections."""
    cfg = LlamaConfig.tiny(vocab_size=61)
    model = Llama(cfg)
    params = model.init(jax.random.key(99), (1, 16))
    return model, params


def _prompt(seed, n, vocab=61):
    return np.asarray(
        jax.random.randint(jax.random.key(seed), (n,), 0, vocab), np.int32
    )


def _run(model, params, prompts, max_new, draft=None, k=0, **ekw):
    cfg = dict(max_batch=4, max_len=64, prefill_buckets=(8, 16, 32),
               decode_chunk=4, page_size=8)
    cfg.update(ekw)
    if draft is not None:
        dmodel, dparams = draft
        cfg.update(speculative_k=k, draft_model=dmodel, draft_params=dparams)
    eng = InferenceEngine(model, params, EngineConfig(**cfg))
    reqs = [eng.submit(p, max_new_tokens=max_new) for p in prompts]
    eng.run()
    return [r.output for r in reqs], eng


class TestSpecEngine:
    def test_self_draft_matches_plain(self, target, draft_same):
        model, params = target
        prompts = [_prompt(i, 5 + i) for i in range(3)]
        plain, _ = _run(model, params, prompts, 12)
        spec, eng = _run(model, params, prompts, 12, draft=draft_same, k=3)
        assert spec == plain
        # Self-draft: near-total acceptance. (Not exactly 100%: the draft
        # runs the contiguous ragged forward, the verify runs the paged
        # chunk forward — bf16 accumulation-order differences can flip
        # argmax on near-ties.)
        assert eng.stats["spec_accepted"] >= 0.8 * eng.stats["spec_proposed"]

    def test_other_draft_matches_plain(self, target, draft_other):
        """Rejections must not change the emitted stream (greedy)."""
        model, params = target
        prompts = [_prompt(10 + i, 6) for i in range(3)]
        plain, _ = _run(model, params, prompts, 14)
        spec, eng = _run(model, params, prompts, 14, draft=draft_other, k=3)
        assert spec == plain
        assert eng.stats["spec_rounds"] > 0

    @pytest.mark.parametrize("k", [1, 2, 4])
    def test_k_sweep(self, target, draft_other, k):
        model, params = target
        prompts = [_prompt(20, 7)]
        plain, _ = _run(model, params, prompts, 10)
        spec, _ = _run(model, params, prompts, 10, draft=draft_other, k=k)
        assert spec == plain

    def test_eos_mid_round(self, target, draft_same):
        """EOS inside an accepted prefix stops the stream at the EOS."""
        model, params = target
        prompts = [_prompt(30, 5)]
        plain_eng = InferenceEngine(
            model, params,
            EngineConfig(max_batch=2, max_len=64, prefill_buckets=(8, 16),
                         decode_chunk=4, page_size=8),
        )
        r0 = plain_eng.submit(prompts[0], max_new_tokens=20)
        plain_eng.run()
        # pick an EOS token that appears mid-stream
        if len(set(r0.output)) < 2:
            pytest.skip("degenerate stream")
        eos = r0.output[len(r0.output) // 2]
        cut = r0.output[: r0.output.index(eos) + 1]

        dmodel, dparams = draft_same
        spec_eng = InferenceEngine(
            model, params,
            EngineConfig(max_batch=2, max_len=64, prefill_buckets=(8, 16),
                         decode_chunk=4, page_size=8, speculative_k=3,
                         draft_model=dmodel, draft_params=dparams),
        )
        r1 = spec_eng.submit(prompts[0], max_new_tokens=20, eos_token=eos)
        spec_eng.run()
        assert r1.output == cut

    def test_sampled_requests_speculate(self, target, draft_same):
        """Non-greedy requests run full rejection sampling: with draft ==
        target at temperature 1 the acceptance prob min(1, p/q) is ~1, so
        sampled rows emit multiple tokens per round (not one)."""
        model, params = target
        dmodel, dparams = draft_same
        eng = InferenceEngine(
            model, params,
            EngineConfig(max_batch=2, max_len=64, prefill_buckets=(8, 16),
                         decode_chunk=4, page_size=8, speculative_k=3,
                         draft_model=dmodel, draft_params=dparams),
        )
        r = eng.submit(_prompt(40, 5), max_new_tokens=8,
                       sampling=SamplingConfig(greedy=False, temperature=1.0))
        g = eng.submit(_prompt(41, 5), max_new_tokens=8)
        eng.run()
        assert len(r.output) == 8 and len(g.output) == 8
        # Self-draft: both rows accept nearly everything (p == q up to the
        # contiguous-vs-paged forward's bf16 accumulation noise), so the 14
        # emitted decode tokens take far fewer than 14 rounds.
        assert eng.stats["spec_accepted"] >= 0.5 * eng.stats["spec_proposed"]
        assert eng.stats["spec_rounds"] <= 6

    def test_sampled_mixed_temperatures(self, target, draft_other):
        """Per-row temperatures: a hot sampled row, a cold one, and a greedy
        row share rounds; each completes with the right token count and the
        greedy row's stream still equals the target-only greedy stream."""
        model, params = target
        plain, _ = _run(model, params, [_prompt(42, 6)], 10)
        dmodel, dparams = draft_other
        eng = InferenceEngine(
            model, params,
            EngineConfig(max_batch=4, max_len=64, prefill_buckets=(8, 16),
                         decode_chunk=4, page_size=8, speculative_k=2,
                         draft_model=dmodel, draft_params=dparams),
        )
        g = eng.submit(_prompt(42, 6), max_new_tokens=10)
        hot = eng.submit(_prompt(43, 6), max_new_tokens=10,
                         sampling=SamplingConfig(greedy=False, temperature=1.5))
        cold = eng.submit(_prompt(44, 6), max_new_tokens=10,
                          sampling=SamplingConfig(greedy=False, temperature=0.2))
        eng.run()
        assert g.output == plain[0]
        assert len(hot.output) == 10 and len(cold.output) == 10

    def test_spec_under_page_pressure(self, target, draft_other):
        model, params = target
        prompts = [_prompt(50 + i, 5) for i in range(4)]
        plain, _ = _run(model, params, prompts, 10)
        spec, eng = _run(model, params, prompts, 10, draft=draft_other, k=3,
                         num_pages=10)
        assert spec == plain
        assert eng.alloc.free_pages == 9

    def test_slot_reuse_after_spec(self, target, draft_same):
        """A request recycled into a slot after a spec round sees no stale
        draft-cache or page state."""
        model, params = target
        p = _prompt(60, 6)
        plain, _ = _run(model, params, [p], 8, max_batch=1)
        spec, _ = _run(
            model, params, [p, _prompt(61, 9), p], 8,
            draft=draft_same, k=3, max_batch=1,
        )
        assert spec[0] == plain[0]
        assert spec[2] == plain[0]

    def test_config_validation(self, target):
        model, params = target
        with pytest.raises(ValueError, match="draft"):
            InferenceEngine(model, params, EngineConfig(
                max_batch=2, max_len=64, speculative_k=2))
