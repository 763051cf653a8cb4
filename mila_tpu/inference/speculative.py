"""Speculative decoding: draft-model proposal + single-pass target verify.

Decode throughput at small batch is weight-stream bound (the whole model is
read per token), so verifying k draft tokens in ONE target forward turns k
sequential weight streams into one. Standard rejection scheme (speculative
sampling): token i is accepted with prob min(1, p_i/q_i); the first
rejection is replaced with a sample from norm(relu(p - q)); if all k are
accepted a bonus token is sampled from the target's k+1-th distribution.
Greedy mode degenerates to "accept while the target argmax agrees", which
reproduces the target-only greedy stream exactly (tested).

The whole round — k+1 draft steps, one target verify forward over k+1
tokens, acceptance math, replacement sampling — is a single jitted program
with donated caches; the host fetches one small (n_accepted, tokens) pair
per round. Cache rewind is positional: both caches may hold stale K/V
beyond the accepted prefix, which the next round's writes overwrite before
any read (attention is masked to the true length).

Batch is 1 per generator (acceptance length is data-dependent per row;
batching ragged speculation belongs to the engine's slot machinery).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mila_tpu.inference.sampling import SamplingConfig


class SpeculativeGenerator:
    """Speculative decode with a small draft model accelerating a target.

    Both models must be cache-capable (``init_kv_cache`` +
    ``forward_with_cache``) and share the tokenizer/vocab.
    """

    def __init__(self, target, target_params, draft, draft_params,
                 *, k: int = 4, max_len: int = 0, cache_dtype=None):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.target = target
        self.target_params = target_params
        self.draft = draft
        self.draft_params = draft_params
        self.k = k
        self.max_len = max_len or min(
            target.config.max_seq_len, getattr(draft.config, "max_seq_len", 1 << 30)
        )
        self.cache_dtype = cache_dtype or jnp.dtype(target.config.param_dtype)
        self.vocab = min(target.config.vocab_size, draft.config.vocab_size)
        self.stats = {"rounds": 0, "accepted": 0, "proposed": 0}
        self._round_jit = None
        self._round_cfg = None

    # ------------------------------------------------------------------

    def _build_round(self, greedy: bool, temperature: float):
        target, draft = self.target, self.draft
        tp, dp = self.target_params, self.draft_params
        k, V = self.k, self.vocab
        temp = max(temperature, 1e-6)

        def round_fn(tparams, dparams, last_token, tcache, dcache, pos, key):
            # --- 1. draft k proposals (+1 step to bank d_k's KV) ---
            def draft_body(carry, key_i):
                tok, dcache, p = carry
                logits, dcache = draft.forward_with_cache(dparams, tok, dcache, p)
                logits = logits[:, -1, :V].astype(jnp.float32)
                if greedy:
                    nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                    q = jax.nn.one_hot(nxt, V, dtype=jnp.float32)[0]
                else:
                    q = jax.nn.softmax(logits / temp, -1)[0]
                    nxt = jax.random.categorical(key_i, logits / temp, -1).astype(jnp.int32)
                return (nxt[:, None], dcache, p + 1), (nxt[0], q)

            keys = jax.random.split(key, k + 2)
            (_, dcache, _), (d_toks, qs) = jax.lax.scan(
                draft_body, (last_token, dcache, pos), keys[:k + 1]
            )
            d_toks = d_toks[:k]  # [k]; step k+1 only banks d_k's KV
            qs = qs[:k]  # [k, V]

            # --- 2. one target forward over [last, d_1..d_k] ---
            seq = jnp.concatenate([last_token[0], d_toks])[None]  # [1, k+1]
            t_logits, tcache = target.forward_with_cache(tparams, seq, tcache, pos)
            p = jax.nn.softmax(
                t_logits[0, :, :V].astype(jnp.float32) / temp, -1
            )  # [k+1, V]; p[i] predicts position pos+i+1

            # --- 3. acceptance ---
            p_of_d = jnp.take_along_axis(p[:k], d_toks[:, None], 1)[:, 0]
            q_of_d = jnp.take_along_axis(qs, d_toks[:, None], 1)[:, 0]
            if greedy:
                acc = p_of_d >= jnp.max(p[:k], -1)  # d_i == target argmax
            else:
                u = jax.random.uniform(keys[k + 1], (k,))
                acc = u < p_of_d / jnp.maximum(q_of_d, 1e-20)
            n = jnp.cumprod(acc.astype(jnp.int32)).sum()  # accepted prefix

            # --- 4. replacement / bonus token from position n ---
            p_n = p[n]  # rejected at draft n+1 → correct dist; n=k → bonus
            if greedy:
                t_new = jnp.argmax(p_n, -1).astype(jnp.int32)
            else:
                q_n = qs[jnp.minimum(n, k - 1)]
                resid = jnp.maximum(p_n - q_n, 0.0)
                resid_ok = resid.sum() > 1e-12
                dist = jnp.where(n == k, p_n, jnp.where(resid_ok, resid, p_n))
                t_new = jax.random.categorical(
                    keys[k], jnp.log(jnp.maximum(dist, 1e-30)), -1
                ).astype(jnp.int32)
            out = jnp.concatenate([d_toks, t_new[None]])  # [k+1]
            return n, out, tcache, dcache

        return jax.jit(round_fn, donate_argnums=(3, 4))

    # ------------------------------------------------------------------

    def generate(
        self,
        prompt: jax.Array,
        max_new_tokens: int,
        key: Optional[jax.Array] = None,
        sampling: Optional[SamplingConfig] = None,
        eos_token: Optional[int] = None,
    ) -> jax.Array:
        """prompt [1, T0] → [1, T0 + max_new_tokens]."""
        cfg = sampling or SamplingConfig(greedy=True)
        greedy = cfg.greedy or cfg.temperature == 0.0
        key = key if key is not None else jax.random.key(0)
        prompt = jnp.asarray(prompt, jnp.int32)
        B, T0 = prompt.shape
        if B != 1:
            raise ValueError("speculative generation is per-sequence (B=1)")
        budget = T0 + max_new_tokens + self.k + 2
        if budget > self.max_len:
            raise ValueError("prompt + max_new_tokens (+k) exceeds max_len")
        tcache = self.target.init_kv_cache(1, self.max_len, self.cache_dtype)
        dcache = self.draft.init_kv_cache(1, self.max_len, self.cache_dtype)

        prefill_t = jax.jit(
            lambda p, t, c: self.target.forward_with_cache(p, t, c, 0)
        )
        prefill_d = jax.jit(
            lambda p, t, c: self.draft.forward_with_cache(p, t, c, 0)[1]
        )
        logits, tcache = prefill_t(self.target_params, prompt, tcache)
        dcache = prefill_d(self.draft_params, prompt, dcache)
        lf = logits[0, -1, : self.vocab].astype(jnp.float32)
        key, sub = jax.random.split(key)
        if greedy:
            first = int(jnp.argmax(lf))
        else:
            first = int(jax.random.categorical(sub, lf / max(cfg.temperature, 1e-6)))

        round_cfg = (greedy, cfg.temperature)
        if self._round_jit is None or self._round_cfg != round_cfg:
            self._round_jit = self._build_round(greedy, cfg.temperature)
            self._round_cfg = round_cfg

        emitted = [first]
        pos = T0  # tokens banked in both caches
        last = first
        while len(emitted) < max_new_tokens:
            key, sub = jax.random.split(key)
            n, out, tcache, dcache = self._round_jit(
                self.target_params, self.draft_params,
                jnp.asarray([[last]], jnp.int32), tcache, dcache,
                jnp.int32(pos), sub,
            )
            n = int(n)
            out = list(map(int, out))
            new_toks = out[:n] + [out[self.k]]
            self.stats["rounds"] += 1
            self.stats["proposed"] += self.k
            self.stats["accepted"] += n
            for t in new_toks:
                emitted.append(t)
                if eos_token is not None and t == eos_token:
                    break
                if len(emitted) >= max_new_tokens:
                    break
            if eos_token is not None and emitted[-1] == eos_token:
                break
            pos += n + 1
            last = emitted[-1]
        emitted = emitted[:max_new_tokens]
        if eos_token is not None and len(emitted) < max_new_tokens:
            emitted += [eos_token] * (max_new_tokens - len(emitted))
        return jnp.concatenate(
            [prompt, jnp.asarray(emitted, jnp.int32)[None]], axis=1
        )

    @property
    def acceptance_rate(self) -> float:
        return self.stats["accepted"] / max(self.stats["proposed"], 1)
