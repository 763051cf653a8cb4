"""Engine stress/edge tests (VERDICT item 8): page exhaustion under
concurrent load, max_len boundary requests, decode-chunk overshoot at the
table edge, reservation accounting, cancellation releasing pages."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference.engine import EngineConfig, InferenceEngine
from mila_tpu.inference.kv_cache import PageAllocator
from mila_tpu.models.llama import Llama, LlamaConfig


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = LlamaConfig.tiny(vocab_size=61)
    model = Llama(cfg)
    params = model.init(jax.random.key(0), (1, 16))
    return model, params


def _prompt(seed, n, vocab=61):
    return np.asarray(
        jax.random.randint(jax.random.key(seed), (n,), 0, vocab), np.int32
    )


class TestReservations:
    def test_available_pages_accounts_reservations(self):
        a = PageAllocator(num_pages=17, page_size=4, max_slots=4, max_len=32)
        assert a.available_pages == 16
        a.reserve(0, 32)  # 8 pages promised
        assert a.available_pages == 8
        a.ensure(0, 8)  # 2 pages drawn from the promise
        assert a.free_pages == 14
        assert a.available_pages == 8  # unchanged: promise already counted
        a.release(0)
        assert a.available_pages == 16

    def test_can_admit_respects_pending_growth(self):
        a = PageAllocator(num_pages=9, page_size=4, max_slots=2, max_len=32)
        a.reserve(0, 20)  # 5 of 8 usable pages
        assert a.can_admit(12)  # 3 pages fit
        assert not a.can_admit(16)  # 4 pages don't
        a.reserve(1, 12)
        assert a.available_pages == 0

    def test_reserve_over_capacity_raises_cleanly(self):
        a = PageAllocator(num_pages=5, page_size=4, max_slots=2, max_len=32)
        before = a.available_pages
        with pytest.raises(RuntimeError, match="reserve"):
            a.reserve(0, 32)  # 8 pages, only 4 usable
        assert a.available_pages == before  # nothing leaked

    def test_trim_keeps_lifetime_reservation(self):
        a = PageAllocator(num_pages=17, page_size=4, max_slots=2, max_len=32)
        a.reserve(0, 32)
        a.ensure(0, 32)
        a.trim(0, 4)  # bucket-padding cleanup frees pages...
        assert a.free_pages == 16 - 1
        assert a.available_pages == 16 - 8  # ...but the promise stands


class TestPagePoolUnderLoad:
    """A pool sized for ~1.5 concurrent requests must still serve many
    queued requests correctly, never exhausting mid-flight."""

    def _engine(self, tiny_llama, num_pages, max_batch=4):
        model, params = tiny_llama
        return InferenceEngine(
            model, params,
            EngineConfig(
                max_batch=max_batch, max_len=64,
                prefill_buckets=(8, 16, 32, 64),
                decode_chunk=4, page_size=8, num_pages=num_pages,
            ),
        )

    def test_all_requests_finish_under_page_pressure(self, tiny_llama):
        # Each request worst-case: bucket 8 + 12 + chunk 4 -> 24 tokens ->
        # 3 pages. Pool of 7 usable pages fits 2 concurrent requests.
        eng = self._engine(tiny_llama, num_pages=8)
        reqs = [eng.submit(_prompt(i, 5), max_new_tokens=12) for i in range(6)]
        done = eng.run()
        assert len(done) == 6
        assert all(len(r.output) == 12 for r in reqs)
        # pool fully recovered
        assert eng.alloc.free_pages == 7
        assert eng.alloc.available_pages == 7

    def test_pressure_output_matches_roomy_pool(self, tiny_llama):
        """Queuing under page pressure must not change any request's tokens."""
        outs = {}
        for num_pages, tag in ((8, "tight"), (64, "roomy")):
            eng = self._engine(tiny_llama, num_pages=num_pages)
            reqs = [eng.submit(_prompt(100 + i, 6), max_new_tokens=8)
                    for i in range(5)]
            eng.run()
            outs[tag] = [r.output for r in reqs]
        assert outs["tight"] == outs["roomy"]

    def test_state_uncorrupted_when_admission_skips(self, tiny_llama):
        eng = self._engine(tiny_llama, num_pages=8)
        big = eng.submit(_prompt(1, 30), max_new_tokens=20)  # 32-bucket: 7 pages
        small = eng.submit(_prompt(2, 5), max_new_tokens=4)
        # First step admits `big` only; `small` must stay intact in queue.
        eng.step()
        assert big.slot >= 0
        assert small.slot == -1 and not small.done
        assert small in eng._queue
        done = eng.run()
        assert {r.id for r in done} == {big.id, small.id}
        assert len(big.output) == 20 and len(small.output) == 4

    def test_impossible_request_rejected_at_submit(self, tiny_llama):
        eng = self._engine(tiny_llama, num_pages=4)  # 3 usable pages
        with pytest.raises(ValueError, match="pages"):
            eng.submit(_prompt(3, 30), max_new_tokens=20)

    def test_cancel_queued_under_pressure_releases_nothing(self, tiny_llama):
        eng = self._engine(tiny_llama, num_pages=8)
        a = eng.submit(_prompt(4, 30), max_new_tokens=20)
        b = eng.submit(_prompt(5, 5), max_new_tokens=4)
        eng.step()
        b.cancel()
        done = eng.run()
        assert b.cancelled and b.done
        assert len(a.output) == 20
        assert eng.alloc.free_pages == 7

    def test_cancel_active_releases_pages_immediately(self, tiny_llama):
        eng = self._engine(tiny_llama, num_pages=8)
        a = eng.submit(_prompt(6, 30), max_new_tokens=18)
        eng.step()
        used_before = eng.alloc.free_pages
        assert used_before < 7
        a.cancel()
        eng.step()
        assert a.done
        assert eng.alloc.free_pages == 7

    def test_priority_respected_under_page_pressure(self, tiny_llama):
        eng = self._engine(tiny_llama, num_pages=8, max_batch=4)
        # Fill the pool with one long request, queue two more.
        first = eng.submit(_prompt(7, 30), max_new_tokens=20)
        lo = eng.submit(_prompt(8, 5), max_new_tokens=4, priority=5)
        hi = eng.submit(_prompt(9, 5), max_new_tokens=4, priority=0)
        order = []
        while eng.has_work():
            for r in eng.step():
                order.append(r.id)
        assert order.index(hi.id) < order.index(lo.id)
        assert len(first.output) == 20


class TestMaxLenEdges:
    def _engine(self, tiny_llama, **kw):
        model, params = tiny_llama
        cfg = dict(max_batch=2, max_len=64, prefill_buckets=(8, 16, 32, 64),
                   decode_chunk=4, page_size=8)
        cfg.update(kw)
        return InferenceEngine(model, params, EngineConfig(**cfg))

    def test_prompt_fills_largest_bucket(self, tiny_llama):
        """Prompt length == largest bucket == table-width capacity."""
        eng = self._engine(tiny_llama)
        r = eng.submit(_prompt(10, 56), max_new_tokens=4)  # 56+4+4 = 64
        eng.run()
        assert len(r.output) == 4

    def test_request_to_exact_max_len(self, tiny_llama):
        """positions never exceed max_len even with chunk overshoot."""
        eng = self._engine(tiny_llama)
        r = eng.submit(_prompt(11, 8), max_new_tokens=52)  # 8+52+4 = 64
        eng.run()
        assert len(r.output) == 52
        assert eng.alloc.free_pages == eng.num_pages_total - 1

    def test_one_over_max_len_rejected(self, tiny_llama):
        eng = self._engine(tiny_llama)
        with pytest.raises(ValueError, match="max_len"):
            eng.submit(_prompt(12, 8), max_new_tokens=53)

    def test_chunk_one(self, tiny_llama):
        eng = self._engine(tiny_llama, decode_chunk=1)
        r = eng.submit(_prompt(13, 8), max_new_tokens=55)  # 8+55+1 = 64
        eng.run()
        assert len(r.output) == 55

    def test_single_token_prompt(self, tiny_llama):
        eng = self._engine(tiny_llama)
        r = eng.submit(_prompt(14, 1), max_new_tokens=5)
        eng.run()
        assert len(r.output) == 5

    def test_contiguous_layout_same_edges(self, tiny_llama):
        eng = self._engine(tiny_llama, kv_layout="contiguous")
        r1 = eng.submit(_prompt(15, 56), max_new_tokens=4)
        r2 = eng.submit(_prompt(16, 1), max_new_tokens=5)
        eng.run()
        assert len(r1.output) == 4 and len(r2.output) == 5


class TestSlotRecyclingIntegrity:
    def test_recycled_slot_does_not_leak_kv(self, tiny_llama):
        """A short request finishing early must not contaminate the request
        recycled into its slot (stale pages are released + re-pointed)."""
        model, params = tiny_llama
        cfgkw = dict(max_batch=1, max_len=64, prefill_buckets=(8, 16, 32, 64),
                     decode_chunk=4, page_size=8)
        eng = InferenceEngine(model, params, EngineConfig(**cfgkw))
        a = eng.submit(_prompt(20, 7), max_new_tokens=6)
        b = eng.submit(_prompt(21, 9), max_new_tokens=6)
        eng.run()
        # Same prompt in a fresh engine must give identical output for b.
        eng2 = InferenceEngine(model, params, EngineConfig(**cfgkw))
        b2 = eng2.submit(_prompt(21, 9), max_new_tokens=6)
        eng2.run()
        assert b.output == b2.output


class TestVariableChunk:
    """Retiring requests must not burn full decode_chunk scans: when every
    active slot is within `bound` tokens of its cap, the engine shrinks the
    scan to the next power of two >= bound (engine.step)."""

    def _engine(self, tiny_llama, **kw):
        model, params = tiny_llama
        cfg = dict(max_batch=2, max_len=64, prefill_buckets=(8, 16, 32, 64),
                   decode_chunk=8, page_size=8)
        cfg.update(kw)
        return InferenceEngine(model, params, EngineConfig(**cfg))

    def test_cap_bound_shrinks_overshoot(self, tiny_llama):
        eng = self._engine(tiny_llama)
        r = eng.submit(_prompt(40, 8), max_new_tokens=3)
        eng.run()
        assert len(r.output) == 3
        # prefill already emitted token 1, so the remaining bound is 2 and
        # the chunk shrinks to 2 (next pow2 >= 2), not the configured 8;
        # slot retired so check stats instead.
        assert eng.stats["steps"] == 1

    def test_mixed_caps_use_max_bound(self, tiny_llama):
        """The chunk must cover the slowest-retiring active slot."""
        eng = self._engine(tiny_llama)
        r1 = eng.submit(_prompt(41, 8), max_new_tokens=2)
        r2 = eng.submit(_prompt(42, 8), max_new_tokens=11)
        eng.run()
        assert len(r1.output) == 2 and len(r2.output) == 11
        # prefill emits each row's first token, so decode bounds enter at
        # 1 and 10: step 1 runs the full chunk 8 (bound 10 > 8), then the
        # remaining bound 2 shrinks step 2 to chunk 2.
        assert eng.stats["steps"] == 2

    def test_output_identical_to_fixed_chunk(self, tiny_llama):
        """Greedy output must not depend on the chunking schedule."""
        outs = []
        for chunk in (1, 8):
            eng = self._engine(tiny_llama, decode_chunk=chunk)
            r = eng.submit(_prompt(43, 8), max_new_tokens=9)
            eng.run()
            outs.append(list(r.output))
        assert outs[0] == outs[1]
