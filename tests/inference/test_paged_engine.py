"""Paged-engine tests: model paged-forward protocol, PageAllocator,
paged-vs-contiguous engine equivalence, streaming/cancel/priority."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference.engine import EngineConfig, InferenceEngine
from mila_tpu.inference.kv_cache import PageAllocator
from mila_tpu.models.gpt2 import GPT2, GPT2Config
from mila_tpu.models.llama import Llama, LlamaConfig


@pytest.fixture(scope="module")
def tiny_gpt2():
    cfg = GPT2Config(
        vocab_size=61, max_seq_len=64, num_layers=2, num_heads=2, embedding_dim=32
    )
    model = GPT2(cfg)
    params = model.init(jax.random.key(0), (1, 16))
    return model, params


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = LlamaConfig.tiny(vocab_size=61)
    model = Llama(cfg)
    params = model.init(jax.random.key(0), (1, 16))
    return model, params


class TestPageAllocator:
    def test_page0_reserved(self):
        a = PageAllocator(num_pages=8, page_size=4, max_slots=2, max_len=16)
        a.ensure(0, 16)  # 4 pages
        assert 0 not in a.table[0].tolist()
        assert a.free_pages == 3  # 7 usable - 4

    def test_ensure_trim_release(self):
        a = PageAllocator(num_pages=16, page_size=4, max_slots=2, max_len=32)
        a.ensure(0, 10)  # 3 pages
        used = [int(p) for p in a.table[0][:3]]
        assert a.free_pages == 12
        a.trim(0, 5)  # keep 2 pages
        assert a.free_pages == 13
        assert int(a.table[0][2]) == 0
        a.ensure(0, 12)  # back to 3 pages
        assert a.free_pages == 12
        a.release(0)
        assert a.free_pages == 15
        assert a.table[0].sum() == 0
        # all pages returned (no leak/duplication)
        a.ensure(1, 32)
        assert a.free_pages == 7
        assert len(set(a.table[1].tolist())) == 8

    def test_exhaustion_raises(self):
        a = PageAllocator(num_pages=3, page_size=4, max_slots=1, max_len=32)
        with pytest.raises(RuntimeError, match="exhausted"):
            a.ensure(0, 32)

    def test_width_guard(self):
        a = PageAllocator(num_pages=8, page_size=4, max_slots=1, max_len=8)
        with pytest.raises(RuntimeError, match="width"):
            a.ensure(0, 12)


class TestPagedForwardProtocol:
    @pytest.mark.parametrize("which", ["gpt2", "llama"])
    def test_prefill_matches_apply(self, which, tiny_gpt2, tiny_llama):
        """Paged prefill's last-token logits == full forward logits at T0-1."""
        model, params = tiny_gpt2 if which == "gpt2" else tiny_llama
        B, bucket = 3, 16
        lens = np.array([5, 16, 9], np.int32)
        rng = np.random.default_rng(0)
        tokens = np.zeros((B, bucket), np.int32)
        for i, n in enumerate(lens):
            tokens[i, :n] = rng.integers(0, 61, n)
        pools = model.init_paged_cache(num_pages=16, page_size=8, dtype=jnp.float32)
        table = np.zeros((B, 4), np.int32)
        table[0, :2] = [1, 2]
        table[1, :2] = [3, 4]
        table[2, :2] = [5, 6]
        logits, pools = model.forward_paged_prefill(
            params, jnp.asarray(tokens), pools, jnp.asarray(table),
            jnp.asarray(lens),
        )
        full = model.apply(params, jnp.asarray(tokens))
        for i, n in enumerate(lens):
            np.testing.assert_allclose(
                logits[i], full[i, n - 1], rtol=2e-4, atol=1e-5
            )

    @pytest.mark.parametrize("which", ["gpt2", "llama"])
    def test_ragged_decode_matches_contiguous(self, which, tiny_gpt2, tiny_llama):
        """Paged ragged decode logits == contiguous ragged decode logits."""
        model, params = tiny_gpt2 if which == "gpt2" else tiny_llama
        B, T0 = 2, 6
        toks = jax.random.randint(jax.random.key(1), (B, T0), 0, 61)
        # Contiguous reference path.
        cache = model.init_kv_cache(B, 32, jnp.float32)
        _, cache = model.forward_with_cache(params, toks, cache, 0)
        nxt = jnp.array([[7], [9]], jnp.int32)
        positions = jnp.full((B,), T0, jnp.int32)
        l_ref, _ = model.forward_with_cache_ragged(params, nxt, cache, positions)
        # Paged path: prefill then one ragged step.
        pools = model.init_paged_cache(num_pages=16, page_size=4, dtype=jnp.float32)
        table = np.zeros((B, 8), np.int32)
        table[0, :4] = [1, 2, 3, 4]
        table[1, :4] = [5, 6, 7, 8]
        padded = jnp.pad(toks, ((0, 0), (0, 2)))  # bucket 8
        _, pools = model.forward_paged_prefill(
            params, padded, pools, jnp.asarray(table), positions
        )
        l_paged, pools2 = model.forward_paged_ragged(
            params, nxt, pools, jnp.asarray(table), positions
        )
        np.testing.assert_allclose(l_paged[:, 0], l_ref[:, 0], rtol=2e-4, atol=1e-5)
        # The written token lands in the right page slot: decode again at T0+1
        # and compare against the contiguous path advanced the same way.
        _, cache = model.forward_with_cache_ragged(params, nxt, cache, positions)
        nxt2 = jnp.array([[3], [4]], jnp.int32)
        l_ref2, _ = model.forward_with_cache_ragged(params, nxt2, cache, positions + 1)
        l_paged2, _ = model.forward_paged_ragged(
            params, nxt2, pools2, jnp.asarray(table), positions + 1
        )
        np.testing.assert_allclose(l_paged2[:, 0], l_ref2[:, 0], rtol=2e-4, atol=1e-5)

    def test_page_crossing(self, tiny_llama):
        """Decode across a page boundary (pos % ps wraps) stays correct."""
        model, params = tiny_llama
        B, ps = 1, 4
        toks = jax.random.randint(jax.random.key(3), (B, 3), 0, 61)
        cache = model.init_kv_cache(B, 32, jnp.float32)
        _, cache = model.forward_with_cache(params, toks, cache, 0)
        pools = model.init_paged_cache(num_pages=8, page_size=ps, dtype=jnp.float32)
        table = np.zeros((B, 8), np.int32)
        table[0, :3] = [2, 5, 1]  # deliberately non-contiguous, unordered
        _, pools = model.forward_paged_prefill(
            params, jnp.pad(toks, ((0, 0), (0, 1))), pools, jnp.asarray(table),
            jnp.asarray([3], jnp.int32),
        )
        pos = jnp.asarray([3], jnp.int32)
        for step in range(6):  # crosses page boundary at pos=4 and pos=8
            nxt = jnp.asarray([[step + 1]], jnp.int32)
            l_ref, cache = model.forward_with_cache_ragged(params, nxt, cache, pos)
            l_paged, pools = model.forward_paged_ragged(
                params, nxt, pools, jnp.asarray(table), pos
            )
            np.testing.assert_allclose(
                l_paged[0, 0], l_ref[0, 0], rtol=2e-4, atol=1e-5
            )
            pos = pos + 1


class TestPagedEngine:
    def _run(self, model, params, layout, prompts, page_size=8, **submit_kw):
        engine = InferenceEngine(
            model, params,
            EngineConfig(max_batch=4, max_len=64, cache_dtype="float32",
                         kv_layout=layout, page_size=page_size),
        )
        reqs = [engine.submit(p, max_new_tokens=6, **submit_kw) for p in prompts]
        engine.run()
        return engine, [list(r.output) for r in reqs]

    @pytest.mark.parametrize("which", ["gpt2", "llama"])
    def test_paged_equals_contiguous(self, which, tiny_gpt2, tiny_llama):
        model, params = tiny_gpt2 if which == "gpt2" else tiny_llama
        prompts = [
            np.array([1, 2, 3], np.int32),
            np.array([10, 20], np.int32),
            np.array([7, 8, 9, 10, 11], np.int32),
        ]
        _, paged = self._run(model, params, "paged", prompts)
        _, contig = self._run(model, params, "contiguous", prompts)
        assert paged == contig

    def test_pages_reclaimed(self, tiny_gpt2):
        model, params = tiny_gpt2
        engine, _ = self._run(
            model, params, "paged",
            [np.array([i + 1], np.int32) for i in range(7)],
        )
        assert all(s is None for s in engine._slots)
        # All pages back in the pool after every request retires.
        assert engine.alloc.free_pages == engine.alloc.num_pages - 1

    def test_batched_prefill_single_call(self, tiny_gpt2):
        """Same-bucket admissions prefill in ONE jitted call."""
        model, params = tiny_gpt2
        engine = InferenceEngine(
            model, params,
            EngineConfig(max_batch=4, max_len=64, cache_dtype="float32",
                         kv_layout="paged", page_size=8),
        )
        for i in range(4):
            engine.submit(np.array([1, 2, 3], np.int32), max_new_tokens=3)
        calls = {"n": 0}
        orig = engine._get_paged_prefill_fn

        def counting(bucket):
            fn = orig(bucket)

            def wrapped(*a, **k):
                calls["n"] += 1
                return fn(*a, **k)

            return wrapped

        engine._get_paged_prefill_fn = counting
        engine.run()
        assert calls["n"] == 1
        assert engine.stats["prefills"] == 4


class TestEngineFeatures:
    def test_streaming_callback(self, tiny_gpt2):
        model, params = tiny_gpt2
        engine = InferenceEngine(
            model, params, EngineConfig(max_batch=2, max_len=64, cache_dtype="float32")
        )
        seen = []
        req = engine.submit(
            np.array([5, 6], np.int32), max_new_tokens=5,
            on_token=lambda r, t: seen.append((r.id, t)),
        )
        engine.run()
        assert [t for _, t in seen] == req.output
        assert all(i == req.id for i, _ in seen)

    def test_cancel_queued(self, tiny_gpt2):
        model, params = tiny_gpt2
        engine = InferenceEngine(
            model, params, EngineConfig(max_batch=1, max_len=64, cache_dtype="float32")
        )
        r1 = engine.submit(np.array([1], np.int32), max_new_tokens=4)
        r2 = engine.submit(np.array([2], np.int32), max_new_tokens=4)
        r2.cancel()
        done = engine.run()
        assert r2 in done and r2.done and r2.output == []
        assert engine.stats["cancelled"] == 1
        assert len(r1.output) == 4

    def test_cancel_active_frees_slot(self, tiny_gpt2):
        model, params = tiny_gpt2
        engine = InferenceEngine(
            model, params,
            EngineConfig(max_batch=1, max_len=64, cache_dtype="float32",
                         kv_layout="paged", page_size=8),
        )
        r1 = engine.submit(np.array([1, 2], np.int32), max_new_tokens=50)
        r2 = engine.submit(np.array([3], np.int32), max_new_tokens=3)
        engine.step()  # r1 admitted + first chunk
        assert not r1.done
        r1.cancel()
        engine.run()
        assert r1.done and r1.cancelled
        assert r2.done and len(r2.output) == 3
        assert engine.alloc.free_pages == engine.alloc.num_pages - 1

    def test_priority_order(self, tiny_gpt2):
        model, params = tiny_gpt2
        engine = InferenceEngine(
            model, params, EngineConfig(max_batch=1, max_len=64, cache_dtype="float32")
        )
        order = []
        kw = dict(max_new_tokens=2)
        r_low = engine.submit(np.array([1], np.int32), priority=5,
                              on_token=lambda r, t: order.append(r.id), **kw)
        r_hi = engine.submit(np.array([2], np.int32), priority=0,
                             on_token=lambda r, t: order.append(r.id), **kw)
        engine.run()
        assert order[0] == r_hi.id  # high priority served first
        assert set(order) == {r_low.id, r_hi.id}


class TestInt8KVPages:
    def test_kv_quantize_roundtrip(self):
        from mila_tpu.inference.kv_cache import kv_quantize

        x = jax.random.normal(jax.random.key(0), (3, 4, 64)) * 2.5
        q, s = kv_quantize(x)
        assert q.dtype == jnp.int8 and s.shape == (3, 4)
        back = q.astype(jnp.float32) * s[..., None]
        err = np.abs(np.asarray(back - x)).max() / np.abs(np.asarray(x)).max()
        assert err < 0.01  # int8 per-token quant: <1% of range

    def test_int8_pools_have_scales(self, tiny_llama):
        model, _ = tiny_llama
        pools = model.init_paged_cache(8, 4, jnp.int8)
        assert pools["k"].dtype == jnp.int8
        # scale planes are [L, NKV, P, ps]: pages are transposed [HD, ps]
        k = pools["k"].shape
        assert "k_scale" in pools
        assert pools["k_scale"].shape == (k[0], k[1], k[2], k[4])
        bf16 = model.init_paged_cache(8, 4, jnp.bfloat16)
        assert "k_scale" not in bf16

    @pytest.mark.parametrize("which", ["gpt2", "llama"])
    def test_int8_decode_close_to_f32(self, which, tiny_gpt2, tiny_llama):
        """int8 KV paged decode tracks the f32 paged decode closely."""
        model, params = tiny_gpt2 if which == "gpt2" else tiny_llama
        B, T0 = 2, 6
        toks = jax.random.randint(jax.random.key(1), (B, T0), 0, 61)
        padded = jnp.pad(toks, ((0, 0), (0, 2)))
        table = np.zeros((B, 8), np.int32)
        table[0, :4] = [1, 2, 3, 4]
        table[1, :4] = [5, 6, 7, 8]
        positions = jnp.full((B,), T0, jnp.int32)
        nxt = jnp.array([[7], [9]], jnp.int32)

        outs = {}
        for dt in (jnp.float32, jnp.int8):
            pools = model.init_paged_cache(num_pages=16, page_size=4, dtype=dt)
            _, pools = model.forward_paged_prefill(
                params, padded, pools, jnp.asarray(table), positions
            )
            logits, _ = model.forward_paged_ragged(
                params, nxt, pools, jnp.asarray(table), positions
            )
            outs[dt] = np.asarray(logits[:, 0])
        ref = outs[jnp.float32]
        rel = np.abs(outs[jnp.int8] - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.05, f"int8 KV drifted {rel:.3f} from f32"
        # Same greedy choice on this input.
        assert (outs[jnp.int8].argmax(-1) == ref.argmax(-1)).all()

    def test_engine_int8_kv_runs(self, tiny_gpt2):
        model, params = tiny_gpt2
        engine = InferenceEngine(
            model, params,
            EngineConfig(max_batch=2, max_len=64, cache_dtype="int8",
                         kv_layout="paged", page_size=8),
        )
        reqs = [engine.submit(np.array([1, 2, 3], np.int32), max_new_tokens=5)
                for _ in range(3)]
        engine.run()
        assert all(len(r.output) == 5 for r in reqs)
        assert all(0 <= t < 61 for r in reqs for t in r.output)

    def test_engine_int8_requires_paged(self, tiny_gpt2):
        model, params = tiny_gpt2
        with pytest.raises(ValueError, match="paged"):
            InferenceEngine(
                model, params,
                EngineConfig(max_batch=2, max_len=64, cache_dtype="int8",
                             kv_layout="contiguous"),
            )
