"""Paged KV cache in HBM: page-table indirection + block allocator.

BASELINE requirement ("BF16 paged KV-cache in TPU HBM"); the reference has
no KV cache at all (SURVEY.md §5 — generation re-runs the full forward,
Gpt2.cpp:182-190). Design follows the vLLM/TPU paged layout:

    k_pages, v_pages: [num_layers, num_pages, page_size, NKV, HD]
    page_table:       [max_seqs, pages_per_seq] int32 (physical page ids)
    seq_lens:         [max_seqs] int32

A host-side free-list allocates pages as sequences grow; attention reads
pages through the table. The gather-based reader here is the correctness
oracle; :mod:`mila_tpu.kernels.paged_attention` streams pages with async
DMA double-buffering instead of materializing the gather.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mila_tpu.ops.attention import NEG_INF


@dataclasses.dataclass
class PagedCacheConfig:
    num_layers: int
    num_kv_heads: int
    head_dim: int
    page_size: int = 128
    num_pages: int = 512
    max_seqs: int = 8
    dtype: str = "bfloat16"

    @property
    def pages_per_seq(self) -> int:
        return self.num_pages  # upper bound; table rows are this wide

    def hbm_bytes(self) -> int:
        per = (
            self.num_layers
            * self.num_pages
            * self.page_size
            * self.num_kv_heads
            * self.head_dim
            * jnp.dtype(self.dtype).itemsize
        )
        return 2 * per


def kv_quantize(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization over the trailing (head_dim) axis.

    x [..., HD] → (q int8 [..., HD], scale f32 [...]) — one scale per
    (token, head), the granularity the paged kernel dequantizes at.
    """
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.round(x32 / scale[..., None]).astype(jnp.int8)
    return q, scale


def make_paged_pools(num_layers: int, num_kv_heads: int, head_dim: int,
                     num_pages: int, page_size: int, dtype) -> dict:
    """Page pools [L, P, NKV, HD, ps] (PAGE-major, TRANSPOSED token-minor
    pages: one page = one contiguous [NKV*HD, ps] DMA covering every head —
    the kernel's slab unit; tokens on the minor axis keep the DMA slices
    128-aligned for HD < 128 and make q @ k^T direct).

    int8 dtype adds per-(page, head, token) scale planes [L, P, NKV, ps] —
    the quantized-KV layout (halves the decode KV stream; BASELINE
    "quantized-paged" design).
    """
    dt = jnp.dtype(dtype)
    shape = (num_layers, num_pages, num_kv_heads, head_dim, page_size)
    pools = {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}
    if dt == jnp.int8:
        sshape = (num_layers, num_pages, num_kv_heads, page_size)
        pools["k_scale"] = jnp.zeros(sshape, jnp.float32)
        pools["v_scale"] = jnp.zeros(sshape, jnp.float32)
    return pools


def paged_scatter(pools: dict, layer: int, page_ids, offs, k, v) -> dict:
    """Write new K/V through the page table.

    ``page_ids``/``offs`` are index arrays with leading dims matching k/v's
    leading dims ([B] for decode, [B, T] for prefill); k/v are
    [..., NKV, HD]. The index arrays land the indexed dims at the FRONT of
    the updated slice — exactly k/v's natural layout. Pages store tokens on
    the MINOR (lane) axis ([NKV, HD, ps], see :func:`make_paged_pools`), so
    ``offs`` indexes the last pool axis.
    """
    pools = dict(pools)
    if "k_scale" in pools:
        qk, sk = kv_quantize(k)
        qv, sv = kv_quantize(v)
        pools["k"] = pools["k"].at[layer, page_ids, :, :, offs].set(qk)
        pools["v"] = pools["v"].at[layer, page_ids, :, :, offs].set(qv)
        pools["k_scale"] = pools["k_scale"].at[layer, page_ids, :, offs].set(sk)
        pools["v_scale"] = pools["v_scale"].at[layer, page_ids, :, offs].set(sv)
        return pools
    pools["k"] = pools["k"].at[layer, page_ids, :, :, offs].set(
        k.astype(pools["k"].dtype)
    )
    pools["v"] = pools["v"].at[layer, page_ids, :, :, offs].set(
        v.astype(pools["v"].dtype)
    )
    return pools


def paged_attention_read(pools: dict, layer: int, q, page_table, seq_lens):
    """Decode-attention read of one layer's pages (dequantizing if int8)."""
    from mila_tpu.kernels.paged_attention import paged_decode_attention

    return paged_decode_attention(
        q,
        pools["k"][layer],
        pools["v"][layer],
        page_table,
        seq_lens,
        k_scale=pools["k_scale"][layer] if "k_scale" in pools else None,
        v_scale=pools["v_scale"][layer] if "v_scale" in pools else None,
    )


class PageAllocator:
    """Host-side page allocator for the engine's paged decode path.

    Page 0 is reserved as a garbage page: table rows of inactive slots point
    at it, so the lock-step decode's K/V writes from finished/empty rows land
    somewhere harmless (never read — their seq_lens stay 0/1).
    """

    def __init__(self, num_pages: int, page_size: int, max_slots: int, max_len: int):
        if num_pages < 2:
            raise ValueError("need at least 2 pages (page 0 is reserved)")
        self.page_size = page_size
        self.num_pages = num_pages
        self.table_width = -(-max_len // page_size)
        self._free = list(range(num_pages - 1, 0, -1))  # page 0 reserved
        self.table = np.zeros((max_slots, self.table_width), np.int32)
        self._used = np.zeros((max_slots,), np.int32)
        # Worst-case reservations (admission gating): pages promised to a
        # slot for its whole lifetime. ensure() may only fail if a caller
        # bypassed reserve() — the engine never does.
        self._reserved = np.zeros((max_slots,), np.int32)

    @property
    def free_pages(self) -> int:
        return len(self._free)

    @property
    def available_pages(self) -> int:
        """Free pages not promised to an active slot's future growth."""
        pending = int(np.maximum(self._reserved - self._used, 0).sum())
        return len(self._free) - pending

    def pages_for(self, length: int) -> int:
        return -(-length // self.page_size)

    def can_admit(self, worst_len: int) -> bool:
        """True if a new sequence with worst-case length ``worst_len`` can be
        admitted without any possibility of mid-flight pool exhaustion."""
        need = self.pages_for(worst_len)
        return need <= self.table_width and need <= self.available_pages

    def reserve(self, slot: int, worst_len: int) -> None:
        """Promise the slot pages for its worst-case length. Raises without
        touching any state if the promise can't be kept (callers gate on
        :meth:`can_admit`, so the engine never trips this)."""
        if not self.can_admit(worst_len):
            raise RuntimeError(
                f"cannot reserve {self.pages_for(worst_len)} pages "
                f"({self.available_pages} available)"
            )
        self._reserved[slot] = self.pages_for(worst_len)

    def ensure(self, slot: int, new_len: int) -> None:
        """Grow the slot's page list to cover ``new_len`` tokens."""
        need = self.pages_for(new_len)
        if need > self.table_width:
            raise RuntimeError(f"length {new_len} exceeds table width")
        while self._used[slot] < need:
            if not self._free:
                raise RuntimeError("KV page pool exhausted")
            self.table[slot, self._used[slot]] = self._free.pop()
            self._used[slot] += 1

    def trim(self, slot: int, keep_len: int) -> None:
        """Release pages beyond ``keep_len`` tokens (bucket-padding cleanup).

        Keeps the slot's lifetime reservation intact — trimming is for
        bucket-padding cleanup, not for shrinking the admission promise.
        """
        keep = self.pages_for(keep_len)
        while self._used[slot] > keep:
            self._used[slot] -= 1
            idx = int(self._used[slot])
            self._free.append(int(self.table[slot, idx]))
            self.table[slot, idx] = 0

    def release(self, slot: int) -> None:
        self.trim(slot, 0)
        self._reserved[slot] = 0


class PagedKVCache:
    """Device page pool + host allocator state.

    Mutating methods return new device arrays (functional); the host-side
    page table / free list are plain numpy for cheap allocation.
    """

    def __init__(self, config: PagedCacheConfig, max_len: int = 0):
        c = config
        self.config = c
        self.max_len = max_len or (c.num_pages // c.max_seqs) * c.page_size
        self.table_width = -(-self.max_len // c.page_size)
        shape = (c.num_layers, c.num_pages, c.page_size, c.num_kv_heads, c.head_dim)
        dt = jnp.dtype(c.dtype)
        self.k_pages = jnp.zeros(shape, dt)
        self.v_pages = jnp.zeros(shape, dt)
        # Host allocator state.
        self._free = list(range(c.num_pages - 1, -1, -1))
        self.page_table = np.zeros((c.max_seqs, self.table_width), np.int32)
        self.seq_lens = np.zeros((c.max_seqs,), np.int32)
        self._active = np.zeros((c.max_seqs,), bool)

    # ---------------- allocator ----------------

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def allocate_slot(self, length_hint: int = 0) -> int:
        """Claim a sequence slot (continuous-batching admission)."""
        for s in range(self.config.max_seqs):
            if not self._active[s]:
                self._active[s] = True
                self.seq_lens[s] = 0
                return s
        raise RuntimeError("no free sequence slots")

    def free_slot(self, slot: int) -> None:
        used = -(-int(self.seq_lens[slot]) // self.config.page_size)
        for i in range(used):
            self._free.append(int(self.page_table[slot, i]))
        self.page_table[slot, :] = 0
        self.seq_lens[slot] = 0
        self._active[slot] = False

    def ensure_capacity(self, slot: int, new_len: int) -> None:
        """Grow the slot's page list to cover ``new_len`` tokens."""
        ps = self.config.page_size
        have = -(-int(self.seq_lens[slot]) // ps)
        need = -(-new_len // ps)
        if new_len > self.max_len:
            raise RuntimeError(f"sequence length {new_len} exceeds max {self.max_len}")
        for i in range(have, need):
            if not self._free:
                raise RuntimeError("KV page pool exhausted")
            self.page_table[slot, i] = self._free.pop()

    # ---------------- device ops ----------------

    def write_tokens(self, slot: int, layer_kv: list, start_pos: int) -> None:
        """Write new K/V for one slot: layer_kv[l] = (k [T,NKV,HD], v).

        Pages may be non-contiguous; writes are per-page dynamic updates.
        """
        c = self.config
        ps = c.page_size
        T = layer_kv[0][0].shape[0]
        self.ensure_capacity(slot, start_pos + T)
        off = 0
        while off < T:
            pos = start_pos + off
            page_idx = int(self.page_table[slot, pos // ps])
            in_page = pos % ps
            n = min(ps - in_page, T - off)
            for l, (k, v) in enumerate(layer_kv):
                self.k_pages = jax.lax.dynamic_update_slice(
                    self.k_pages,
                    k[off:off + n][None, None].astype(self.k_pages.dtype),
                    (l, page_idx, in_page, 0, 0),
                )
                self.v_pages = jax.lax.dynamic_update_slice(
                    self.v_pages,
                    v[off:off + n][None, None].astype(self.v_pages.dtype),
                    (l, page_idx, in_page, 0, 0),
                )
            off += n
        self.seq_lens[slot] = max(int(self.seq_lens[slot]), start_pos + T)

    def gather_kv(self, layer: int, slots: np.ndarray) -> tuple[jax.Array, jax.Array]:
        """Materialize contiguous [B, maxT, NKV, HD] K/V for the given slots
        (correctness-oracle read path)."""
        table = jnp.asarray(self.page_table[slots])  # [B, W]
        k = self.k_pages[layer][table]  # [B, W, ps, NKV, HD]
        v = self.v_pages[layer][table]
        B, W, ps, NKV, HD = k.shape
        return k.reshape(B, W * ps, NKV, HD), v.reshape(B, W * ps, NKV, HD)


def paged_decode_attention_ref(
    q: jax.Array,  # [B, 1, NH, HD]
    k_pages: jax.Array,  # [num_pages, ps, NKV, HD] (one layer)
    v_pages: jax.Array,
    page_table: jax.Array,  # [B, W] int32
    seq_lens: jax.Array,  # [B] int32 (includes the current token)
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Gather-based paged decode attention (oracle for the Pallas kernel)."""
    import math

    B, _, NH, HD = q.shape
    W = page_table.shape[1]
    ps = k_pages.shape[1]
    NKV = k_pages.shape[2]
    scale = 1.0 / math.sqrt(HD) if scale is None else scale
    k = k_pages[page_table].reshape(B, W * ps, NKV, HD)
    v = v_pages[page_table].reshape(B, W * ps, NKV, HD)
    group = NH // NKV
    qg = q.reshape(B, 1, NKV, group, HD)
    s = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
    ) * scale
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, W * ps), 1)
    valid = pos < seq_lens[:, None]
    s = jnp.where(valid[:, None, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.reshape(B, 1, NH, HD).astype(q.dtype)
