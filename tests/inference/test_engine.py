"""Continuous-batching engine + paged KV cache tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference import Generator, SamplingConfig
from mila_tpu.inference.engine import EngineConfig, InferenceEngine
from mila_tpu.inference.kv_cache import (
    PagedCacheConfig,
    PagedKVCache,
    paged_decode_attention_ref,
)
from mila_tpu.models.gpt2 import GPT2, GPT2Config
from mila_tpu.ops import decode_attention


@pytest.fixture(scope="module")
def tiny_model():
    cfg = GPT2Config(
        vocab_size=61, max_seq_len=64, num_layers=2, num_heads=2, embedding_dim=32
    )
    model = GPT2(cfg)
    params = model.init(jax.random.key(0), (1, 16))
    return model, params


class TestRaggedDecode:
    def test_matches_scalar_pos_decode(self, tiny_model):
        """Ragged decode at uniform positions == scalar-pos decode."""
        model, params = tiny_model
        B, T0 = 2, 5
        toks = jax.random.randint(jax.random.key(1), (B, T0), 0, 61)
        cache = model.init_kv_cache(B, 32, jnp.float32)
        _, cache = model.forward_with_cache(params, toks, cache, 0)
        nxt = jnp.array([[7], [9]], jnp.int32)
        l_scalar, _ = model.forward_with_cache(params, nxt, cache, T0)
        l_ragged, _ = model.forward_with_cache_ragged(
            params, nxt, cache, jnp.full((B,), T0, jnp.int32)
        )
        np.testing.assert_allclose(l_scalar[:, 0], l_ragged[:, 0], rtol=2e-4, atol=1e-5)

    def test_mixed_positions(self, tiny_model):
        """Rows at different positions decode independently and correctly."""
        model, params = tiny_model
        k = jax.random.key(2)
        t_a = jax.random.randint(k, (1, 4), 0, 61)
        t_b = jax.random.randint(jax.random.fold_in(k, 1), (1, 9), 0, 61)
        # Row 0 has 4 tokens, row 1 has 9 tokens.
        cache = model.init_kv_cache(2, 32, jnp.float32)
        ca = model.init_kv_cache(1, 32, jnp.float32)
        cb = model.init_kv_cache(1, 32, jnp.float32)
        _, ca = model.forward_with_cache(params, t_a, ca, 0)
        _, cb = model.forward_with_cache(params, t_b, cb, 0)
        cache = jax.tree_util.tree_map(
            lambda full, a, b: full.at[0:1].set(a).at[1:2].set(b), cache, ca, cb
        )
        nxt = jnp.array([[3], [11]], jnp.int32)
        l_ragged, _ = model.forward_with_cache_ragged(
            params, nxt, cache, jnp.array([4, 9], jnp.int32)
        )
        la, _ = model.forward_with_cache(params, nxt[:1], ca, 4)
        lb, _ = model.forward_with_cache(params, nxt[1:], cb, 9)
        np.testing.assert_allclose(l_ragged[0, 0], la[0, 0], rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(l_ragged[1, 0], lb[0, 0], rtol=2e-4, atol=1e-5)


class TestInferenceEngine:
    def test_single_request_matches_generator(self, tiny_model):
        model, params = tiny_model
        engine = InferenceEngine(
            model, params, EngineConfig(max_batch=4, max_len=64, cache_dtype="float32")
        )
        prompt = np.array([5, 9, 13], np.int32)
        req = engine.submit(prompt, max_new_tokens=8)
        done = engine.run()
        assert req in done and req.done
        gen = Generator(model, params, max_len=64, cache_dtype=jnp.float32)
        expected = gen.generate(jnp.asarray(prompt)[None], 8)
        np.testing.assert_array_equal(np.asarray(req.output), np.asarray(expected[0, 3:]))

    def test_concurrent_requests_are_independent(self, tiny_model):
        """Batched continuous decoding must give the same tokens as running
        each request alone — the core continuous-batching invariant."""
        model, params = tiny_model
        prompts = [
            np.array([1, 2, 3], np.int32),
            np.array([10, 20], np.int32),
            np.array([7, 8, 9, 10, 11], np.int32),
        ]
        solo_outputs = []
        for p in prompts:
            e = InferenceEngine(
                model, params, EngineConfig(max_batch=4, max_len=64, cache_dtype="float32")
            )
            r = e.submit(p, max_new_tokens=6)
            e.run()
            solo_outputs.append(list(r.output))

        engine = InferenceEngine(
            model, params, EngineConfig(max_batch=4, max_len=64, cache_dtype="float32")
        )
        reqs = [engine.submit(p, max_new_tokens=6) for p in prompts]
        engine.run()
        for r, solo in zip(reqs, solo_outputs):
            assert list(r.output) == solo

    def test_more_requests_than_slots(self, tiny_model):
        model, params = tiny_model
        engine = InferenceEngine(
            model, params, EngineConfig(max_batch=2, max_len=64, cache_dtype="float32")
        )
        reqs = [
            engine.submit(np.array([i + 1], np.int32), max_new_tokens=4)
            for i in range(5)
        ]
        done = engine.run()
        assert len(done) == 5
        assert all(len(r.output) == 4 for r in reqs)
        assert engine.stats["tokens_out"] == 20

    def test_eos_stops_early(self, tiny_model):
        model, params = tiny_model
        engine = InferenceEngine(
            model, params, EngineConfig(max_batch=2, max_len=64, cache_dtype="float32")
        )
        # Find the first greedy token, then use it as EOS: request finishes at 1.
        probe = engine.submit(np.array([5], np.int32), max_new_tokens=1)
        engine.run()
        eos = probe.output[0]
        req = engine.submit(np.array([5], np.int32), max_new_tokens=16, eos_token=eos)
        engine.run()
        assert req.done and len(req.output) == 1

    def test_ttft_recorded(self, tiny_model):
        model, params = tiny_model
        engine = InferenceEngine(
            model, params, EngineConfig(max_batch=2, max_len=64, cache_dtype="float32")
        )
        req = engine.submit(np.array([1, 2], np.int32), max_new_tokens=2)
        engine.run()
        assert req.ttft_s > 0
        assert req.finished_at >= req.first_token_at

    def test_overflow_rejected(self, tiny_model):
        model, params = tiny_model
        engine = InferenceEngine(model, params, EngineConfig(max_batch=2, max_len=32))
        with pytest.raises(ValueError, match="max_len"):
            engine.submit(np.arange(30, dtype=np.int32), max_new_tokens=10)


class TestPagedKVCache:
    def _cfg(self, **kw):
        defaults = dict(
            num_layers=2, num_kv_heads=2, head_dim=8, page_size=4,
            num_pages=16, max_seqs=3, dtype="float32",
        )
        defaults.update(kw)
        return PagedCacheConfig(**defaults)

    def test_alloc_free_cycle(self):
        cache = PagedKVCache(self._cfg())
        s0 = cache.allocate_slot()
        s1 = cache.allocate_slot()
        assert s0 != s1
        free0 = cache.free_pages
        cache.ensure_capacity(s0, 10)  # 3 pages of 4
        assert cache.free_pages == free0 - 3
        cache.seq_lens[s0] = 10
        cache.free_slot(s0)
        assert cache.free_pages == free0

    def test_pool_exhaustion(self):
        cache = PagedKVCache(self._cfg(num_pages=2), max_len=64)
        s = cache.allocate_slot()
        with pytest.raises(RuntimeError, match="exhausted"):
            cache.ensure_capacity(s, 64)

    def test_write_and_gather_round_trip(self, rng_key):
        cfg = self._cfg()
        cache = PagedKVCache(cfg)
        s = cache.allocate_slot()
        T = 10
        kvs = []
        for l in range(cfg.num_layers):
            k = jax.random.normal(jax.random.fold_in(rng_key, l), (T, 2, 8))
            v = jax.random.normal(jax.random.fold_in(rng_key, 100 + l), (T, 2, 8))
            kvs.append((k, v))
        cache.write_tokens(s, kvs, 0)
        k_got, v_got = cache.gather_kv(0, np.array([s]))
        np.testing.assert_allclose(k_got[0, :T], kvs[0][0], rtol=1e-6)
        np.testing.assert_allclose(v_got[0, :T], kvs[0][1], rtol=1e-6)

    def test_paged_decode_matches_contiguous(self, rng_key):
        """Paged gather attention == contiguous decode attention."""
        cfg = self._cfg()
        cache = PagedKVCache(cfg)
        B, T, NH, HD = 2, 10, 4, 8
        slots = []
        k_all = jax.random.normal(rng_key, (B, T, 2, HD))
        v_all = jax.random.normal(jax.random.fold_in(rng_key, 1), (B, T, 2, HD))
        for b in range(B):
            s = cache.allocate_slot()
            slots.append(s)
            cache.write_tokens(
                s, [(k_all[b], v_all[b]) for _ in range(cfg.num_layers)], 0
            )
        q = jax.random.normal(jax.random.fold_in(rng_key, 2), (B, 1, NH, HD))
        lens = jnp.full((B,), T, jnp.int32)
        out = paged_decode_attention_ref(
            q, cache.k_pages[0], cache.v_pages[0],
            jnp.asarray(cache.page_table[slots]), lens,
        )
        # Contiguous oracle.
        maxT = cache.table_width * cfg.page_size
        k_cont = jnp.zeros((B, maxT, 2, HD)).at[:, :T].set(k_all)
        v_cont = jnp.zeros((B, maxT, 2, HD)).at[:, :T].set(v_all)
        ref = decode_attention(q, k_cont, v_cont, lens)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_hbm_bytes_accounting(self):
        cfg = self._cfg()
        assert cfg.hbm_bytes() == 2 * 2 * 16 * 4 * 2 * 8 * 4
