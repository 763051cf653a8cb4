"""Inference engine: continuous batching over a paged (or slotted) KV cache.

Parity: reference ``InferenceEngine`` (Engine/InferenceEngine.ixx:19 —
aspirational skeleton: load/predict/validate), completed here per BASELINE:
request admission, batched prefill, lock-step decode over all active slots,
per-request sampling/EOS, slot recycling. Static shapes throughout (XLA):
``max_batch`` decode slots, bucketed prefill lengths, one compiled decode
program reused for every step.

Two KV layouts share the engine logic:

- ``paged`` (default for models with a paged forward): HBM page pools
  [L, P, NKV, HD, ps] + host-side :class:`PageAllocator`; decode reads pages
  through the Pallas paged-attention kernel, admission prefills a whole
  bucket batch in ONE jitted call and writes pages through the table.
- ``contiguous``: per-slot [max_batch, maxT] caches (simpler; what the
  reference's aspirational engine would have grown into).
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mila_tpu.inference.kv_cache import PageAllocator
from mila_tpu.inference.sampling import SamplingConfig, sample_logits
from mila_tpu.utils.logging import Logger


@dataclasses.dataclass
class Request:
    id: int
    prompt: np.ndarray  # [T0] int32
    max_new_tokens: int
    sampling: SamplingConfig = dataclasses.field(default_factory=SamplingConfig)
    eos_token: Optional[int] = None
    priority: int = 0  # lower = served first; FIFO within a priority level
    # Streaming: called with (request, token_id) for every emitted token.
    on_token: Optional[Callable] = None
    # filled by the engine:
    output: list = dataclasses.field(default_factory=list)
    done: bool = False
    cancelled: bool = False
    slot: int = -1
    submitted_at: float = 0.0
    first_token_at: float = 0.0
    finished_at: float = 0.0

    @property
    def ttft_s(self) -> float:
        return (self.first_token_at - self.submitted_at) if self.first_token_at else 0.0

    def cancel(self) -> None:
        """Request cancellation; the engine retires it at the next step."""
        self.cancelled = True


@dataclasses.dataclass
class EngineConfig:
    max_batch: int = 8
    max_len: int = 1024
    prefill_buckets: tuple = (32, 64, 128, 256, 512, 1024)
    cache_dtype: str = "bfloat16"
    # Decode this many tokens per engine step inside one jitted scan before
    # fetching results (amortizes host round-trips; slots that finish
    # mid-chunk overshoot harmlessly — their cache is reset on slot reuse).
    decode_chunk: int = 8
    # KV layout: "auto" picks paged when the model implements the paged
    # forward protocol (init_paged_cache/forward_paged_*), else contiguous.
    kv_layout: str = "auto"  # auto | paged | contiguous
    page_size: int = 128
    num_pages: int = 0  # 0 → max_batch * ceil(max_len/page_size) + 1
    # Speculative decoding inside the engine (paged layout): a small draft
    # model proposes speculative_k tokens per round; the target verifies all
    # of them in ONE forward_paged_chunk call. Greedy requests accept the
    # longest matching prefix (+ the target's bonus token); sampled requests
    # fall back to one target token per round. 0 = off.
    speculative_k: int = 0
    draft_model: Any = None
    draft_params: Any = None


class InferenceEngine:
    """Continuous-batching engine over a cache-capable model."""

    def __init__(self, model, params, config: Optional[EngineConfig] = None):
        self.model = model
        self.params = params
        self.config = config or EngineConfig()
        c = self.config
        paged_capable = hasattr(model, "forward_paged_ragged")
        if c.kv_layout == "auto":
            self.kv_layout = "paged" if paged_capable else "contiguous"
        else:
            if c.kv_layout == "paged" and not paged_capable:
                raise ValueError("model has no paged-forward protocol")
            self.kv_layout = c.kv_layout
        dt = jnp.dtype(c.cache_dtype)
        if dt == jnp.int8 and self.kv_layout != "paged":
            raise ValueError("int8 KV cache requires the paged layout")
        if self.kv_layout == "paged":
            ps = c.page_size
            width = -(-c.max_len // ps)
            num_pages = c.num_pages or (c.max_batch * width + 1)
            self.pools = model.init_paged_cache(num_pages, ps, dt)
            self.alloc = PageAllocator(num_pages, ps, c.max_batch, c.max_len)
            self.num_pages_total = num_pages
            self.cache = None
        else:
            self.cache = model.init_kv_cache(c.max_batch, c.max_len, dt)
            self.pools = None
            self.alloc = None
        self.spec_k = int(c.speculative_k or 0)
        if self.spec_k:
            if self.kv_layout != "paged":
                raise ValueError("speculative decoding requires the paged layout")
            if not hasattr(model, "forward_paged_chunk"):
                raise ValueError("model has no forward_paged_chunk (speculative verify)")
            if c.draft_model is None or c.draft_params is None:
                raise ValueError("speculative_k needs draft_model + draft_params")
            if c.draft_model.config.vocab_size != model.config.vocab_size:
                raise ValueError("draft/target vocab mismatch")
            self.draft_cache = c.draft_model.init_kv_cache(
                c.max_batch, c.max_len, jnp.bfloat16
            )
            self._spec_fns = None
        self._slots: list[Optional[Request]] = [None] * c.max_batch
        self._queue: list[Request] = []
        self._req_ids = itertools.count()
        self._positions = np.zeros((c.max_batch,), np.int32)
        self._last_token = np.zeros((c.max_batch,), np.int32)
        self._rng = jax.random.key(0)
        self._decode_fns: dict[int, Callable] = {}
        self._dev = None  # device-resident decode operands (_device_operands)
        self._dev_dirty = True
        self._giga_pools = None  # stacked [L,B,T,KD] pools (giga decode)
        self._prefill_fns: dict[int, Callable] = {}
        self.stats = {"steps": 0, "prefills": 0, "tokens_out": 0, "cancelled": 0,
                      "spec_rounds": 0, "spec_accepted": 0, "spec_proposed": 0}

    # ------------- public API -------------

    def submit(
        self,
        prompt,
        max_new_tokens: int = 64,
        sampling: Optional[SamplingConfig] = None,
        eos_token: Optional[int] = None,
        priority: int = 0,
        on_token: Optional[Callable] = None,
    ) -> Request:
        req = Request(
            id=next(self._req_ids),
            prompt=np.asarray(prompt, np.int32).reshape(-1),
            max_new_tokens=max_new_tokens,
            sampling=sampling or SamplingConfig(greedy=True),
            eos_token=eos_token,
            priority=priority,
            on_token=on_token,
            submitted_at=time.monotonic(),
        )
        margin = self._overshoot_margin()
        if len(req.prompt) + max_new_tokens + margin > self.config.max_len:
            raise ValueError("prompt + max_new_tokens exceeds engine max_len")
        if self.kv_layout == "paged":
            worst = self.alloc.pages_for(self._worst_len(req))
            if worst > self.num_pages_total - 1:
                raise ValueError(
                    f"request needs {worst} KV pages; pool has "
                    f"{self.num_pages_total - 1}"
                )
        self._queue.append(req)
        # Priority order, FIFO within a level (stable sort by (priority, id)).
        self._queue.sort(key=lambda r: (r.priority, r.id))
        return req

    def has_work(self) -> bool:
        return bool(self._queue) or any(s is not None for s in self._slots)

    def run(self, requests: Optional[list[Request]] = None) -> list[Request]:
        """Drive until all submitted work completes; returns finished requests."""
        finished: list[Request] = []
        while self.has_work():
            finished.extend(self.step())
        return finished

    # ------------- engine internals -------------

    def _bucket_for(self, n: int) -> int:
        for b in self.config.prefill_buckets:
            if n <= b and b <= self.config.max_len:
                return b
        raise ValueError(f"prompt length {n} exceeds buckets")

    # ---- contiguous-layout prefill ----

    def _get_prefill_fn(self, bucket: int):
        if bucket not in self._prefill_fns:
            model = self.model

            @functools.partial(jax.jit, donate_argnums=(1,))
            def prefill(params, cache, tokens, slot_onehot, true_len):
                # tokens: [1, bucket]; writes the slot's cache rows.
                logits, upd = model.forward_with_cache(
                    params,
                    tokens,
                    jax.tree_util.tree_map(
                        # batch is axis ndim-4 ([..., B, T, NKV, HD]; Llama
                        # stacks layers in front: [L, B, T, NKV, HD])
                        lambda c: jax.lax.slice_in_dim(c, 0, 1, axis=c.ndim - 4),
                        cache,
                    ),
                    0,
                )
                # Scatter the single-row cache update into the slot.
                def put(full, one):
                    mask = (slot_onehot > 0).reshape(
                        (1,) * (full.ndim - 4) + (-1, 1, 1, 1)
                    )
                    return jnp.where(
                        mask,
                        jnp.broadcast_to(one, full.shape).astype(full.dtype),
                        full,
                    )

                new_cache = jax.tree_util.tree_map(put, cache, upd)
                last = jnp.take_along_axis(
                    logits, (true_len - 1)[:, None, None].astype(jnp.int32), axis=1
                )
                return last[:, 0], new_cache

            self._prefill_fns[bucket] = prefill
        return self._prefill_fns[bucket]

    # ---- paged-layout prefill (batched: all same-bucket admissions in one
    # call; rows not being admitted get a zero page-table row, so their
    # writes land on the reserved garbage page 0) ----

    def _get_paged_prefill_fn(self, bucket: int):
        key = ("paged", bucket)
        if key not in self._prefill_fns:
            model = self.model
            V = model.config.vocab_size

            @functools.partial(jax.jit, donate_argnums=(1,))
            def prefill(params, pools, tokens, table, true_len, skey,
                        greedy_mask, temps):
                logits, pools = model.forward_paged_prefill(
                    params, tokens, pools, table, true_len
                )
                # Sample ON DEVICE (temperature/greedy — the same surface
                # the chunked decode supports): the caller fetches [B]
                # int32 tokens instead of a [B, V] f32 logits block (~4MB
                # at Llama vocab — dominated remote-TPU prefill wall time).
                # top-k/top-p requests lazily fetch `logits` and resample.
                lg = logits[:, :V].astype(jnp.float32)
                greedy_tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                scaled = lg / jnp.maximum(temps[:, None], 1e-6)
                sampled = jax.random.categorical(skey, scaled, axis=-1)
                tok = jnp.where(greedy_mask, greedy_tok,
                                sampled.astype(jnp.int32))
                return tok, logits, pools

            self._prefill_fns[key] = prefill
        return self._prefill_fns[key]

    def _get_decode_fn(self, chunk: int):
        """Chunked greedy-capable decode: ``chunk`` ragged steps in one
        jitted lax.scan, sampling on device each step.

        EVERY per-step operand (token row, positions, PRNG key) is device-
        resident and threaded THROUGH the call: the host neither uploads
        per-chunk inputs nor splits keys outside jit. On remote TPUs each
        host-side device op is a tunnel round-trip (~30-90ms) — the r5
        engine bench measured 6s of a 7.8s serving run in exactly these
        (t_prefill 0.42s + t_decode 1.37s, wall 7.79s)."""
        if chunk not in self._decode_fns:
            model = self.model
            V = model.config.vocab_size
            paged = self.kv_layout == "paged"

            def sample_step(logits, key, greedy_mask, temps,
                            greedy_tok=None):
                """Greedy/temperature sampling; the categorical (gumbel
                noise + log over [B, V] — ~2 ms/step of pure VPU
                transcendentals at Llama vocab) only runs when some active
                slot actually samples (lax.cond, runtime-skipped)."""
                logits = logits.astype(jnp.float32)
                if greedy_tok is None:
                    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

                def do_sample(_):
                    scaled = logits / jnp.maximum(temps[:, None], 1e-6)
                    sampled = jax.random.categorical(
                        key, scaled, axis=-1).astype(jnp.int32)
                    return jnp.where(greedy_mask, greedy_tok, sampled)

                return jax.lax.cond(jnp.all(greedy_mask),
                                    lambda _: greedy_tok, do_sample, None)

            if paged:

                @functools.partial(jax.jit, donate_argnums=(1,))
                def decode(params, pools, table, tokens, positions, key,
                           greedy_mask, temps):
                    key, sub = jax.random.split(key)
                    keys = jax.random.split(sub, chunk)

                    def body(carry, k):
                        toks, pools, pos = carry
                        logits, pools = model.forward_paged_ragged(
                            params, toks, pools, table, pos
                        )
                        nxt = sample_step(logits[:, -1, :V], k, greedy_mask, temps)
                        return (nxt[:, None], pools, pos + 1), nxt

                    (tok_next, pools, pos_next), toks = jax.lax.scan(
                        body, (tokens, pools, positions), keys
                    )
                    return toks.T, tok_next, pos_next, key, pools

            elif self._use_giga_decode():

                # Whole-model single-kernel decode (kernels/decode_giga.py):
                # the cache lives as PRE-STACKED [L, B, T, KD] pools across
                # chunks (self._giga_pools, converted back to the dict only
                # around admissions) — stacking inside the decode jit gives
                # the scan-carried pools a stack-derived layout and XLA
                # inserts ~134MB layout-conversion copies per STEP
                # (benchmarks/r5_branch_probe.py; measured 5.5 vs 2.2
                # ms/step). giga_step is ragged-native (per-row positions)
                # and returns full logits, so sampled slots work too.
                @functools.partial(jax.jit, donate_argnums=(1,))
                def decode(params, pools, tokens, positions, key,
                           greedy_mask, temps):
                    kp, vp = pools
                    key, sub = jax.random.split(key)
                    keys = jax.random.split(sub, chunk)

                    def body(carry, k):
                        toks, kp, vp, pos = carry
                        tok_g, logits, kp, vp = model.giga_step(
                            params, toks, kp, vp, pos)
                        # The kernel's fused argmax IS the greedy answer —
                        # all-greedy steps never touch the [B, V] logits.
                        nxt = sample_step(logits[:, :V], k, greedy_mask,
                                          temps, greedy_tok=tok_g[:, 0])
                        return (nxt[:, None], kp, vp, pos + 1), nxt

                    (tok_next, kp, vp, pos_next), toks = jax.lax.scan(
                        body, (tokens, kp, vp, positions), keys
                    )
                    return toks.T, tok_next, pos_next, key, (kp, vp)

            else:

                # Donating the cache is load-bearing: a non-donated cache
                # argument defeats in-place DUS inside the scan — measured
                # 444 us/step of full-cache copies at Llama-1B shapes
                # (benchmarks/r4_dus.py). The caller reassigns self.cache
                # from the return value.
                @functools.partial(jax.jit, donate_argnums=(1,))
                def decode(params, cache, tokens, positions, key,
                           greedy_mask, temps):
                    key, sub = jax.random.split(key)
                    keys = jax.random.split(sub, chunk)

                    def body(carry, k):
                        toks, cache, pos = carry
                        logits, cache = model.forward_with_cache_ragged(
                            params, toks, cache, pos
                        )
                        nxt = sample_step(logits[:, -1, :V], k, greedy_mask, temps)
                        return (nxt[:, None], cache, pos + 1), nxt

                    (tok_next, cache, pos_next), toks = jax.lax.scan(
                        body, (tokens, cache, positions), keys
                    )
                    return toks.T, tok_next, pos_next, key, cache

            self._decode_fns[chunk] = decode
        return self._decode_fns[chunk]

    def _use_giga_decode(self) -> bool:
        """Contiguous-layout decode can run the whole-model giga kernel:
        params carry a giga_pack, the model implements the stacked-pool
        protocol, and the cache is bf16 with a %8 row count (kernel
        alignment rules)."""
        try:
            import jax.numpy as _jnp

            return (
                self.kv_layout == "contiguous"
                and isinstance(self.params, dict)
                and "giga_pack" in self.params
                and hasattr(self.model, "giga_step")
                and hasattr(self.model, "stack_kv_cache")
                and self.config.max_len % 8 == 0
                and jnp.dtype(self.config.cache_dtype) == _jnp.bfloat16
            )
        except Exception:  # noqa: BLE001 - conservative fallback
            return False

    def _device_operands(self):
        """Device-resident decode operands, rebuilt only when slot state
        changed (admission/retirement) — not per chunk."""
        if self._dev_dirty or self._dev is None:
            c = self.config
            greedy_mask = np.zeros((c.max_batch,), bool)
            temps = np.ones((c.max_batch,), np.float32)
            for i, s in enumerate(self._slots):
                if s is not None:
                    sc = s.sampling
                    greedy_mask[i] = sc.greedy or sc.temperature == 0.0
                    temps[i] = max(sc.temperature, 1e-6)
            key = self._dev["key"] if self._dev else self._rng
            self._dev = {
                "tok": jnp.asarray(self._last_token[:, None]),
                "pos": jnp.asarray(self._positions),
                "greedy": jnp.asarray(greedy_mask),
                "temps": jnp.asarray(temps),
                "key": key,
                "table_np": None,
                "table": None,
            }
            self._dev_dirty = False
        if self.kv_layout == "paged":
            tbl = self.alloc.table
            if (self._dev["table_np"] is None
                    or not np.array_equal(self._dev["table_np"], tbl)):
                self._dev["table_np"] = tbl.copy()
                self._dev["table"] = jnp.asarray(tbl)
        return self._dev

    # ---- speculative decoding (paged target + contiguous draft) ----

    def _get_spec_fns(self):
        if self._spec_fns is None:
            model, c = self.model, self.config
            dmodel = c.draft_model
            k = self.spec_k
            V = model.config.vocab_size

            @functools.partial(jax.jit, donate_argnums=(1, 3))
            def spec_round(params, pools, dparams, dcache, table, last_token,
                           positions, key, greedy, temps):
                """One batched speculative round, entirely on device.

                greedy [B] bool / temps [B] f32 are per-row. Greedy rows
                draft and accept by argmax (the stream provably equals the
                target-only greedy stream); sampled rows run the standard
                speculative-sampling rejection scheme — accept d_i with
                prob min(1, p_i/q_i), replace the first rejection with a
                sample from norm(relu(p - q)), bonus from p_k if all
                accepted — so the emitted stream is distributed exactly as
                target-only sampling. Returns (n_accepted [B], drafts
                [B, k], replacement [B], pools, dcache).
                """
                B = last_token.shape[0]
                t1 = jnp.maximum(temps, 1e-6)[:, None]
                kd, ka, kr = jax.random.split(key, 3)

                # --- 1. draft k proposals (per-row greedy or temp-sampled) ---
                def body(carry, key_i):
                    toks, dcache, pos = carry
                    logits, dcache = dmodel.forward_with_cache_ragged(
                        dparams, toks, dcache, pos
                    )
                    logits = logits[:, -1, :V].astype(jnp.float32) / t1
                    q = jax.nn.softmax(logits, -1)  # [B, V]
                    samp = jax.random.categorical(key_i, logits, -1)
                    nxt = jnp.where(greedy, jnp.argmax(logits, -1), samp)
                    nxt = nxt.astype(jnp.int32)
                    qv = jnp.take_along_axis(q, nxt[:, None], 1)[:, 0]
                    return (nxt[:, None], dcache, pos + 1), (nxt, qv, q)

                keys = jax.random.split(kd, k)
                (_, dcache, _), (d_toks, q_of_d, qs) = jax.lax.scan(
                    body, (last_token[:, None], dcache, positions), keys
                )
                d_toks = d_toks.T  # [B, k]
                q_of_d = q_of_d.T  # [B, k]
                qs = jnp.swapaxes(qs, 0, 1)  # [B, k, V]

                # --- 2. one target verify forward over [last, d_1..d_k] ---
                tokens_k1 = jnp.concatenate([last_token[:, None], d_toks], 1)
                t_logits, pools = model.forward_paged_chunk(
                    params, tokens_k1, pools, table, positions
                )
                t_logits = t_logits[..., :V].astype(jnp.float32) / t1[..., None]
                p = jax.nn.softmax(t_logits, -1)  # [B, k+1, V]
                t_arg = jnp.argmax(t_logits, -1).astype(jnp.int32)  # [B, k+1]
                p_of_d = jnp.take_along_axis(
                    p[:, :k], d_toks[..., None], 2
                )[..., 0]  # [B, k]

                # --- 3. per-row acceptance prefix ---
                u = jax.random.uniform(ka, (B, k))
                acc_samp = u < p_of_d / jnp.maximum(q_of_d, 1e-20)
                acc = jnp.where(greedy[:, None], d_toks == t_arg[:, :k], acc_samp)
                n = jnp.cumprod(acc.astype(jnp.int32), 1).sum(1)  # [B]

                # --- 4. replacement (rejected at n) / bonus (n == k) token ---
                p_n = jnp.take_along_axis(p, n[:, None, None], 1)[:, 0]  # [B, V]
                q_n = jnp.take_along_axis(
                    qs, jnp.minimum(n, k - 1)[:, None, None], 1
                )[:, 0]
                resid = jnp.maximum(p_n - q_n, 0.0)
                resid_ok = resid.sum(-1, keepdims=True) > 1e-12
                dist = jnp.where(
                    (n == k)[:, None], p_n, jnp.where(resid_ok, resid, p_n)
                )
                t_samp = jax.random.categorical(
                    kr, jnp.log(jnp.maximum(dist, 1e-30)), -1
                )
                t_rep = jnp.take_along_axis(t_arg, n[:, None], 1)[:, 0]
                t_new = jnp.where(greedy, t_rep, t_samp).astype(jnp.int32)
                return n, d_toks, t_new, pools, dcache

            self._spec_fns = spec_round
        return self._spec_fns

    def _get_draft_prefill_fn(self, bucket: int):
        key = ("draft", bucket)
        if key not in self._prefill_fns:
            dmodel = self.config.draft_model

            @functools.partial(jax.jit, donate_argnums=(1,))
            def prefill(dparams, dcache, tokens, slot_mask):
                """Batched draft prefill: ONE forward over the whole slot
                batch (tokens [max_batch, bucket]); rows outside
                ``slot_mask`` keep their existing cache. Admission cost is
                one draft forward per bucket group, not per request."""
                _, upd = dmodel.forward_with_cache(dparams, tokens, dcache, 0)

                def put(full, new):
                    mask = (slot_mask > 0).reshape(
                        (1,) * (full.ndim - 4) + (-1,) + (1,) * 3
                    )
                    return jnp.where(mask, new.astype(full.dtype), full)

                return jax.tree_util.tree_map(put, dcache, upd)

            self._prefill_fns[key] = prefill
        return self._prefill_fns[key]

    def _spec_round(self, active: list[int], finished: list[Request]) -> None:
        """One speculative round: draft k proposals, verify them all in one
        target forward, emit the accepted prefix + replacement/bonus token.
        Sampled rows run full rejection sampling on device (the emitted
        stream is distributed exactly as target-only sampling)."""
        c = self.config
        k = self.spec_k
        spec_round = self._get_spec_fns()
        for i in active:
            self.alloc.ensure(i, int(self._positions[i]) + k + 1)
        greedy = np.zeros((c.max_batch,), bool)
        temps = np.ones((c.max_batch,), np.float32)
        for i in active:
            s = self._slots[i].sampling
            greedy[i] = s.greedy or s.temperature == 0.0
            temps[i] = max(s.temperature, 1e-6)
        positions = jnp.asarray(self._positions)
        self._rng, sub = jax.random.split(self._rng)
        n, drafts, t_new, self.pools, self.draft_cache = spec_round(
            self.params, self.pools, c.draft_params, self.draft_cache,
            jnp.asarray(self.alloc.table), jnp.asarray(self._last_token),
            positions, sub, jnp.asarray(greedy), jnp.asarray(temps),
        )
        n_np = np.asarray(n)
        drafts_np = np.asarray(drafts)
        t_new_np = np.asarray(t_new)
        for i in active:
            req = self._slots[i]
            a = int(n_np[i])
            emit = [int(x) for x in drafts_np[i, :a]] + [int(t_new_np[i])]
            self.stats["spec_proposed"] = self.stats.get("spec_proposed", 0) + k
            self.stats["spec_accepted"] = self.stats.get("spec_accepted", 0) + a
            for t in emit:
                if req.done:
                    break
                self._emit(req, t)
                self._maybe_finish(req, finished)
            if self._slots[i] is not None:
                self._positions[i] = int(self._positions[i]) + a + 1
                self._last_token[i] = emit[-1]
        self.stats["spec_rounds"] = self.stats.get("spec_rounds", 0) + 1
        self.stats["steps"] += 1

    def _drop_cancelled(self, finished: list[Request]) -> None:
        still: list[Request] = []
        for r in self._queue:
            if r.cancelled:
                self._retire(r, finished)
            else:
                still.append(r)
        self._queue = still
        for req in list(self._slots):
            if req is not None and req.cancelled:
                self._retire(req, finished)

    def _overshoot_margin(self) -> int:
        """Cache positions can overshoot the final emitted token by up to a
        decode chunk (or a speculative round of k drafts + bonus)."""
        return max(self.config.decode_chunk, self.spec_k + 1, 1)

    def _worst_len(self, req: Request) -> int:
        """Worst-case token count a request can ever occupy: the prefill
        bucket (pages are written for the whole bucket before trim) or the
        final length including decode-chunk overshoot, whichever is larger."""
        bucket = self._bucket_for(len(req.prompt))
        final = len(req.prompt) + req.max_new_tokens + self._overshoot_margin()
        return max(bucket, min(final, self.config.max_len))

    def _admit(self, finished: list[Request]) -> None:
        """Fill free slots from the queue and prefill them.

        Paged layout: admission is gated on a worst-case page reservation so
        the pool can NEVER exhaust mid-prefill or mid-decode — requests that
        don't fit stay queued (in priority order) until retirements free
        pages. State is untouched for skipped requests.
        """
        c = self.config
        admitted: list[Request] = []
        skipped: list[Request] = []
        while self._queue and any(s is None for s in self._slots):
            req = self._queue.pop(0)
            if self.kv_layout == "paged" and not self.alloc.can_admit(
                self._worst_len(req)
            ):
                skipped.append(req)
                continue
            slot = next(i for i, s in enumerate(self._slots) if s is None)
            req.slot = slot
            self._slots[slot] = req
            if self.kv_layout == "paged":
                self.alloc.reserve(slot, self._worst_len(req))
            admitted.append(req)
        if skipped:
            self._queue = sorted(
                skipped + self._queue, key=lambda r: (r.priority, r.id)
            )
        if not admitted:
            return
        if self.kv_layout == "paged":
            # Batched prefill: one jitted call per bucket present this round.
            groups: dict[int, list[Request]] = {}
            for req in admitted:
                groups.setdefault(self._bucket_for(len(req.prompt)), []).append(req)
            for bucket, reqs in sorted(groups.items()):
                self._paged_prefill_group(bucket, reqs, finished)
        else:
            for req in admitted:
                self._contiguous_prefill(req, finished)

    def _paged_prefill_group(self, bucket: int, reqs: list[Request],
                             finished: list[Request]) -> None:
        c = self.config
        tokens = np.zeros((c.max_batch, bucket), np.int32)
        table = np.zeros((c.max_batch, self.alloc.table_width), np.int32)
        true_len = np.zeros((c.max_batch,), np.int32)
        for req in reqs:
            T0 = len(req.prompt)
            self.alloc.ensure(req.slot, bucket)
            tokens[req.slot, :T0] = req.prompt
            table[req.slot] = self.alloc.table[req.slot]
            true_len[req.slot] = T0
        prefill = self._get_paged_prefill_fn(bucket)
        greedy_mask = np.zeros((c.max_batch,), bool)
        temps = np.ones((c.max_batch,), np.float32)
        for req in reqs:
            s = req.sampling
            greedy_mask[req.slot] = s.greedy or s.temperature == 0.0
            temps[req.slot] = max(s.temperature, 1e-6)
        self._rng, skey = jax.random.split(self._rng)
        t0 = time.monotonic()
        toks_dev, logits, self.pools = prefill(
            self.params,
            self.pools,
            jnp.asarray(tokens),
            jnp.asarray(table),
            jnp.asarray(true_len),
            skey,
            jnp.asarray(greedy_mask),
            jnp.asarray(temps),
        )
        if self.spec_k:
            # The draft model mirrors the prompts in its contiguous cache:
            # one batched draft forward per bucket group (not per request).
            draft_prefill = self._get_draft_prefill_fn(bucket)
            mask = np.zeros((c.max_batch,), np.float32)
            for req in reqs:
                mask[req.slot] = 1.0
            self.draft_cache = draft_prefill(
                c.draft_params, self.draft_cache,
                jnp.asarray(tokens), jnp.asarray(mask),
            )
        toks = np.asarray(toks_dev)  # [max_batch] — the single small fetch
        self.stats["t_prefill_s"] = (self.stats.get("t_prefill_s", 0.0)
                                     + time.monotonic() - t0)
        self.stats["prefill_groups"] = self.stats.get("prefill_groups", 0) + 1
        V = self.model.config.vocab_size
        logits_np = None
        for req in reqs:
            T0 = len(req.prompt)
            self.alloc.trim(req.slot, T0)  # release bucket-padding pages
            s = req.sampling
            if s.top_k > 0 or s.top_p < 1.0:
                # Richer sampling than the in-jit temperature path: fetch
                # the logits block once for the group and resample locally.
                if logits_np is None:
                    logits_np = np.asarray(logits)
                self._rng, sub = jax.random.split(self._rng)
                tok = int(sample_logits(
                    jnp.asarray(logits_np[req.slot, :V]), sub, s))
            else:
                tok = int(toks[req.slot])
            self._emit(req, tok)
            req.first_token_at = time.monotonic()
            self._positions[req.slot] = T0
            self._last_token[req.slot] = tok
            self._dev_dirty = True
            self.stats["prefills"] += 1
            self._maybe_finish(req, finished)

    def _contiguous_prefill(self, req: Request, finished: list[Request]) -> None:
        c = self.config
        if self._giga_pools is not None:
            # Admissions write the dict cache; fold the stacked giga pools
            # back (rare vs decode chunks — once per admission wave).
            self.cache = jax.jit(self.model.unstack_kv_cache)(
                *self._giga_pools)
            self._giga_pools = None
        T0 = len(req.prompt)
        bucket = self._bucket_for(T0)
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, :T0] = req.prompt
        onehot = np.zeros((c.max_batch,), np.float32)
        onehot[req.slot] = 1.0
        prefill = self._get_prefill_fn(bucket)
        logits, self.cache = prefill(
            self.params,
            self.cache,
            jnp.asarray(tokens),
            jnp.asarray(onehot),
            jnp.asarray([T0], jnp.int32),
        )
        self._rng, sub = jax.random.split(self._rng)
        tok = int(sample_logits(logits[0, : self.model.config.vocab_size], sub, req.sampling))
        self._emit(req, tok)
        req.first_token_at = time.monotonic()
        self._positions[req.slot] = T0
        self._last_token[req.slot] = tok
        self._dev_dirty = True
        self.stats["prefills"] += 1
        self._maybe_finish(req, finished)

    def step(self) -> list[Request]:
        """One engine iteration: retire cancellations, admit+prefill queued
        requests, one chunked decode for all active slots. Returns requests
        finished this step."""
        c = self.config
        finished: list[Request] = []
        self._drop_cancelled(finished)
        self._admit(finished)

        # Lock-step chunked decode across active slots: `decode_chunk` ragged
        # steps run inside one jitted scan with on-device sampling, then ONE
        # host fetch delivers all tokens (per-token D2H would dominate on
        # remote TPUs). Slots finishing mid-chunk overshoot; extra tokens are
        # discarded and their cache rows/pages are reclaimed on retirement.
        active = [i for i, s in enumerate(self._slots) if s is not None]
        if active and self.spec_k:
            self._spec_round(active, finished)
            return finished
        if active:
            # Variable chunk: when every active slot is within `bound` tokens
            # of its max_new_tokens cap, shrink the scan to the next power of
            # two >= bound (the jitted decode specializes per chunk, so this
            # costs at most log2(decode_chunk) extra compiles and stops
            # retiring requests from burning up to chunk-1 wasted ~ms-scale
            # decode steps each). EOS-finishes stay unpredictable; the cap
            # bound is the guaranteed part.
            chunk = max(self.config.decode_chunk, 1)
            bound = max(
                self._slots[i].max_new_tokens - len(self._slots[i].output)
                for i in active
            )
            if 0 < bound < chunk:
                chunk = 1 << (bound - 1).bit_length()
            decode = self._get_decode_fn(chunk)
            t0 = time.monotonic()
            if self.kv_layout == "paged":
                for i in active:
                    self.alloc.ensure(i, int(self._positions[i]) + chunk)
            dev = self._device_operands()
            start_pos = self._positions.copy()
            if self.kv_layout == "paged":
                toks_dev, tok_next, pos_next, key_next, self.pools = decode(
                    self.params, self.pools, dev["table"],
                    dev["tok"], dev["pos"], dev["key"],
                    dev["greedy"], dev["temps"],
                )
            elif self._use_giga_decode():
                if self._giga_pools is None:
                    # One-time stack after the latest admission wave; the
                    # pools then stay in the pallas-preferred layout for
                    # every subsequent chunk.
                    self._giga_pools = jax.jit(self.model.stack_kv_cache)(
                        self.cache)
                    self.cache = None
                (toks_dev, tok_next, pos_next, key_next,
                 self._giga_pools) = decode(
                    self.params, self._giga_pools, dev["tok"], dev["pos"],
                    dev["key"], dev["greedy"], dev["temps"],
                )
            else:
                toks_dev, tok_next, pos_next, key_next, self.cache = decode(
                    self.params, self.cache, dev["tok"], dev["pos"],
                    dev["key"], dev["greedy"], dev["temps"],
                )
            dev["tok"], dev["pos"], dev["key"] = tok_next, pos_next, key_next
            toks = np.asarray(toks_dev)  # [B, chunk] — the single fetch
            self.stats["t_decode_s"] = (self.stats.get("t_decode_s", 0.0)
                                        + time.monotonic() - t0)
            for i in active:
                req = self._slots[i]
                for j in range(chunk):
                    if req.done:
                        break
                    self._emit(req, int(toks[i, j]))
                    self._maybe_finish(req, finished)
                # The cache advanced by the full chunk for every live row.
                if self._slots[i] is not None:
                    self._positions[i] = int(start_pos[i]) + chunk
                    self._last_token[i] = int(toks[i, chunk - 1])
            self.stats["steps"] += 1
        return finished

    def _emit(self, req: Request, tok: int) -> None:
        req.output.append(tok)
        self.stats["tokens_out"] += 1
        if req.on_token is not None:
            req.on_token(req, tok)

    def _maybe_finish(self, req: Request, finished: list) -> None:
        hit_eos = req.eos_token is not None and req.output and req.output[-1] == req.eos_token
        if len(req.output) >= req.max_new_tokens or hit_eos or req.cancelled:
            self._retire(req, finished)

    def _retire(self, req: Request, finished: list) -> None:
        req.done = True
        req.finished_at = time.monotonic()
        self._dev_dirty = True  # slot state changed: rebuild decode operands
        if req.cancelled:
            self.stats["cancelled"] += 1
        finished.append(req)
        if req.slot >= 0 and self._slots[req.slot] is req:
            if self.kv_layout == "paged":
                self.alloc.release(req.slot)
            self._positions[req.slot] = 0
            self._last_token[req.slot] = 0
            self._slots[req.slot] = None


def _forward_ragged(model, params, tokens, cache, positions):
    """Decode forward where each batch row sits at its own position
    (contiguous layout; kept for external callers)."""
    return model.forward_with_cache_ragged(params, tokens, cache, positions)
