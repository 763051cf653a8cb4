"""Paged decode attention: interpret-mode fallback correctness on CPU.

The DMA/semaphore fast path needs real TPU hardware; its on-hardware
validation lives in benchmarks/kernel_bench.py + the TPU smoke script.
Here we pin the wrapper contract (page-major [P, NKV, HD, ps] layout,
padding, masks) against the gather oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.inference.kv_cache import paged_decode_attention_ref
from mila_tpu.kernels.paged_attention import paged_decode_attention
from mila_tpu.ops import decode_attention


def _setup(key, B=2, NKV=2, NH=4, HD=64, P=16, ps=8, lens=(10, 17)):
    k1, k2, k3 = jax.random.split(key, 3)
    k_pages = jax.random.normal(k1, (P, NKV, HD, ps))
    v_pages = jax.random.normal(k2, (P, NKV, HD, ps))
    W = 4
    table = jax.random.permutation(k3, P)[: B * W].reshape(B, W)
    q = jax.random.normal(jax.random.fold_in(key, 9), (B, 1, NH, HD))
    return q, k_pages, v_pages, table.astype(jnp.int32), jnp.asarray(lens, jnp.int32)


class TestPagedDecode:
    def test_matches_gather_oracle(self, rng_key):
        q, kp, vp, table, lens = _setup(rng_key)
        out = paged_decode_attention(q, kp, vp, table, lens)
        ref = paged_decode_attention_ref(
            q, kp.transpose(0, 3, 1, 2), vp.transpose(0, 3, 1, 2), table, lens
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_matches_contiguous_decode(self, rng_key):
        """Scattered pages must behave exactly like a contiguous cache."""
        q, kp, vp, table, lens = _setup(rng_key)
        out = paged_decode_attention(q, kp, vp, table, lens)
        B, W = table.shape
        ps = kp.shape[3]
        # Build the contiguous equivalent by page lookup.
        k_cont = kp.transpose(0, 3, 1, 2)[table].reshape(B, W * ps, kp.shape[1], kp.shape[2])
        v_cont = vp.transpose(0, 3, 1, 2)[table].reshape(B, W * ps, vp.shape[1], vp.shape[2])
        ref = decode_attention(q, k_cont, v_cont, lens)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_length_mask_strict(self, rng_key):
        """Entries beyond seq_len must not influence output."""
        q, kp, vp, table, lens = _setup(rng_key, lens=(5, 9))
        out1 = paged_decode_attention(q, kp, vp, table, lens)
        # Poison all pages beyond the lengths: find used positions.
        kp2 = kp + 1e6  # poison everything...
        vp2 = vp - 1e6
        # ...then restore only the valid positions via the oracle trick:
        # easier — poison one unused page per sequence.
        ps = kp.shape[3]
        # position >= len lives in page lens//ps at offset lens%ps onwards
        kp_p = kp
        vp_p = vp
        for b, ln in enumerate((5, 9)):
            page = int(table[b, (ln // ps)])
            kp_p = kp_p.at[page, :, :, ln % ps:].add(1e5)
            vp_p = vp_p.at[page, :, :, ln % ps:].add(1e5)
        out2 = paged_decode_attention(q, kp_p, vp_p, table, lens)
        np.testing.assert_allclose(out1, out2, rtol=1e-4, atol=1e-4)

    def test_gqa_groups(self, rng_key):
        q, kp, vp, table, lens = _setup(rng_key, NKV=2, NH=8)
        out = paged_decode_attention(q, kp, vp, table, lens)
        ref = paged_decode_attention_ref(
            q, kp.transpose(0, 3, 1, 2), vp.transpose(0, 3, 1, 2), table, lens
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
