"""Pallas paged decode attention: page-table KV gather with async DMA
double buffering and online softmax.

BASELINE core kernel (paged BF16 KV-cache read path). Design follows the
TPU paged-attention construction: scalar-prefetched ``lengths`` and
``page_indices`` drive per-page async copies HBM→VMEM; two VMEM buffers
alternate so the next block of pages streams in while the MXU works on the
current one; online softmax (m, l, acc in VMEM scratch) merges blocks.
Query is a single decode token per sequence: q [B, NKV, G, HD] where
G = query heads per KV head (GQA groups co-located — zero communication).

Correctness oracle: :func:`mila_tpu.inference.kv_cache.paged_decode_attention_ref`.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def _paged_kernel(
    # scalar prefetch
    lengths_ref,  # [B] int32
    page_tbl_ref,  # [B, W] int32
    # inputs
    q_ref,  # [1, 1, G8, HD] VMEM (per (b, h) block)
    k_pages_ref,  # [NKV, P, HD, ps] ANY/HBM
    v_pages_ref,
    *rest,  # [ks_ref, vs_ref] if quant, then o_ref + scratch
    pages_per_block: int,
    page_size: int,
    num_blocks: int,
    sm_scale: float,
    quant: bool,
):
    if quant:
        # Scale planes [NKV, P, ps] f32 in HBM + their VMEM double buffers.
        (ks_ref, vs_ref, o_ref, k_buf, v_buf, ks_buf, vs_buf,
         k_sem, v_sem, s_sem, m_scr, l_scr, acc_scr) = rest
    else:
        ks_ref = vs_ref = ks_buf = vs_buf = s_sem = None
        (o_ref, k_buf, v_buf, k_sem, v_sem, m_scr, l_scr, acc_scr) = rest
    b = pl.program_id(0)
    h = pl.program_id(1)
    blk = pl.program_id(2)
    bk = pages_per_block * page_size
    length = lengths_ref[b]

    def start_copy(dst_slot, block_idx):
        for i in range(pages_per_block):
            page = page_tbl_ref[b, block_idx * pages_per_block + i]
            pltpu.make_async_copy(
                k_pages_ref.at[h, page],
                k_buf.at[dst_slot, i],
                k_sem.at[dst_slot],
            ).start()
            pltpu.make_async_copy(
                v_pages_ref.at[h, page],
                v_buf.at[dst_slot, i],
                v_sem.at[dst_slot],
            ).start()
            if quant:
                pltpu.make_async_copy(
                    ks_ref.at[h, page],
                    ks_buf.at[dst_slot, i],
                    s_sem.at[dst_slot],
                ).start()
                pltpu.make_async_copy(
                    vs_ref.at[h, page],
                    vs_buf.at[dst_slot, i],
                    s_sem.at[dst_slot],
                ).start()

    def wait_copy(slot, block_idx):
        # One shared semaphore per buffer slot counts all page copies;
        # waiting re-materializes each copy descriptor (jax>=0.9 forbids
        # raw semaphore_wait on DMA semaphores).
        for i in range(pages_per_block):
            page = page_tbl_ref[b, block_idx * pages_per_block + i]
            pltpu.make_async_copy(
                k_pages_ref.at[h, page], k_buf.at[slot, i], k_sem.at[slot]
            ).wait()
            pltpu.make_async_copy(
                v_pages_ref.at[h, page], v_buf.at[slot, i], v_sem.at[slot]
            ).wait()
            if quant:
                pltpu.make_async_copy(
                    ks_ref.at[h, page], ks_buf.at[slot, i], s_sem.at[slot]
                ).wait()
                pltpu.make_async_copy(
                    vs_ref.at[h, page], vs_buf.at[slot, i], s_sem.at[slot]
                ).wait()

    @pl.when(blk == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)
        # Prefetch the first block (init_flag pattern).
        @pl.when(length > 0)
        def _():
            start_copy(0, 0)

    active = blk * bk < length

    @pl.when(active)
    def _run():
        slot = blk % 2
        # Prefetch next block into the other buffer while we compute.
        @pl.when((blk + 1) * bk < length)
        def _prefetch():
            start_copy((blk + 1) % 2, blk + 1)

        wait_copy(slot, blk)
        q = q_ref[0, 0].astype(jnp.float32)  # [G8, HD]
        # Transposed pages [HD, ps]: q @ k_page IS q·k^T, one dot per page.
        s = jnp.concatenate(
            [jax.lax.dot(q, k_buf[slot, i].astype(jnp.float32),
                         preferred_element_type=jnp.float32)
             for i in range(pages_per_block)], axis=1,
        ) * sm_scale  # [G8, bk]
        if quant:
            # Per-token K scales: s_ij = (q_i · q8k_j) * kscale_j * sm_scale.
            s = s * ks_buf[slot].reshape(1, bk)
        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + blk * bk
        s = jnp.where(pos < length, s, MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_next = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
        )
        m_scr[...] = m_next
        l_scr[...] = l_next
        if quant:
            # Fold per-token V scales into p (cheaper: [G8,bk] vs [bk,HD]).
            p = p * vs_buf[slot].reshape(1, bk)
        # v pages are transposed [HD, ps]: contract p's token lanes against
        # each page's token lanes (NT matmul), one dot per page.
        pv = acc_scr[...] * alpha[:, :1]
        for i in range(pages_per_block):
            pv = pv + jax.lax.dot_general(
                p[:, i * page_size : (i + 1) * page_size],
                v_buf[slot, i].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_scr[...] = pv

    @pl.when(blk == num_blocks - 1)
    def _store():
        l = l_scr[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def paged_decode_attention(
    q: jax.Array,  # [B, 1, NH, HD]
    k_pages: jax.Array,  # [NKV, P, HD, ps]
    v_pages: jax.Array,
    page_table: jax.Array,  # [B, W] int32
    seq_lens: jax.Array,  # [B] int32
    *,
    k_scale: Optional[jax.Array] = None,  # [NKV, P, ps] f32 (int8 KV pages)
    v_scale: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    pages_per_block: int = 4,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Paged KV decode attention. Returns [B, 1, NH, HD].

    Page layout is head-major with TRANSPOSED pages [NKV, P, HD, ps] (one
    DMA per (head, page); tokens on the minor axis keep every DMA slice
    128-aligned for HD < 128, and q @ k_page is directly q·k^T).

    With ``k_scale``/``v_scale`` the pages hold int8 values quantized
    per (head, page, token); the kernel streams half the KV bytes plus
    tiny scale rows and dequantizes on the fly (scales folded into the
    score / probability matrices, never into the [HD, ps] tiles).
    """
    B, one, NH, HD = q.shape
    NKV, P, _, ps = k_pages.shape
    W = page_table.shape[1]
    G = NH // NKV
    sm_scale = 1.0 / math.sqrt(HD) if scale is None else scale
    quant = k_scale is not None

    interp = _interpret_default() if interpret is None else interpret
    if interp:
        # The DMA/semaphore path needs real hardware.
        from mila_tpu.inference.kv_cache import paged_decode_attention_ref

        kp, vp = k_pages.transpose(0, 1, 3, 2), v_pages.transpose(0, 1, 3, 2)
        if quant:
            kp = kp.astype(jnp.float32) * k_scale[..., None]
            vp = vp.astype(jnp.float32) * v_scale[..., None]
            kp = kp.astype(q.dtype)
            vp = vp.astype(q.dtype)
        kp = kp.transpose(1, 2, 0, 3)
        vp = vp.transpose(1, 2, 0, 3)
        return paged_decode_attention_ref(
            q, kp, vp, page_table, seq_lens, scale=sm_scale
        )

    # Pad the group axis up to the sublane minimum (zero q rows contribute
    # nothing; padded outputs are sliced off). Decode attention is KV-stream
    # bound, so the extra MXU rows are free.
    G8 = -(-G // 8) * 8
    qg = q.reshape(B, NKV, G, HD)
    if G8 != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, G8 - G), (0, 0)))

    if W % pages_per_block:
        pad = pages_per_block - W % pages_per_block
        page_table = jnp.pad(page_table, ((0, 0), (0, pad)))
        W += pad
    num_blocks = W // pages_per_block
    grid = (B, NKV, num_blocks)

    in_specs = [
        pl.BlockSpec((1, 1, G8, HD), lambda b, h, i, *_: (b, h, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    args = [qg, k_pages, v_pages]
    scratch = [
        pltpu.VMEM((2, pages_per_block, HD, ps), k_pages.dtype),
        pltpu.VMEM((2, pages_per_block, HD, ps), v_pages.dtype),
    ]
    if quant:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
        scratch += [
            pltpu.VMEM((2, pages_per_block, ps), jnp.float32),
            pltpu.VMEM((2, pages_per_block, ps), jnp.float32),
        ]
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    scratch += [
        pltpu.VMEM((G8, 128), jnp.float32),
        pltpu.VMEM((G8, 128), jnp.float32),
        pltpu.VMEM((G8, HD), jnp.float32),
    ]

    out = pl.pallas_call(
        functools.partial(
            _paged_kernel,
            pages_per_block=pages_per_block,
            page_size=ps,
            num_blocks=num_blocks,
            sm_scale=sm_scale,
            quant=quant,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, G8, HD), lambda b, h, i, *_: (b, h, 0, 0)),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((B, NKV, G8, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(seq_lens.astype(jnp.int32), page_table.astype(jnp.int32), *args)

    out = out[:, :, :G].reshape(B, 1, NH, HD)
    return out
