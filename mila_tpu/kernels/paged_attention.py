"""Pallas paged decode attention: page-table KV gather with async DMA
double buffering and online softmax.

BASELINE core kernel (paged BF16 KV-cache read path). Pages are PAGE-MAJOR
with all KV heads together and TRANSPOSED token-minor tiles:

    k_pages, v_pages: [P, NKV, HD, ps]  (kernel view: [P, KD, ps], KD=NKV*HD)

so one page is ONE contiguous DMA of KD*ps bytes (128 KB at Llama-1B bf16)
covering every head. The r1-r3 head-major layout [NKV, P, HD, ps] issued a
16 KB DMA per (head, page) — 8x the descriptor count — and measured only
199 GB/s end-to-end; page-major DMAs restore slab-sized transfers.

GQA is handled with lane-packed queries (kernels/dense_attention.py
``pack_queries``): q_pk [B, NH, KD] carries head n's vector in its kv
head's lane range and zeros elsewhere, so q_pk[b] @ page[KD, ps] yields
true per-head scores [NH, ps] in one MXU dot, and the pv accumulation
lands head n's answer in its kv lanes (selected at finalize).

With ``k_scale``/``v_scale`` ([P, NKV, ps] f32) the pages hold int8 values
quantized per (page, head, token); scales fold into the score/probability
matrices (sublane-broadcast NKV -> NH), never into the [KD, ps] tiles.

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
    q_ref,  # [1, NH, KD] VMEM (lane-packed queries for row b)
    k_pages_ref,  # [P, KD, ps] ANY/HBM
    v_pages_ref,
    *rest,  # [ks_ref, vs_ref] if quant ([P, NKV, ps] f32), then o_ref + scratch
    pages_per_block: int,
    page_size: int,
    num_blocks: int,
    sm_scale: float,
    nkv: int,
    group: int,
    hd: int,
    quant: bool,
):
    if quant:
        (ks_ref, vs_ref, o_ref, k_buf, v_buf, ks_buf, vs_buf,
         k_sem, v_sem, s_sem, m_scr, l_scr, acc_scr) = rest
    else:
        ks_ref = vs_ref = ks_buf = vs_buf = s_sem = None
        (o_ref, k_buf, v_buf, k_sem, v_sem, m_scr, l_scr, acc_scr) = rest
    b = pl.program_id(0)
    blk = pl.program_id(1)
    nh = nkv * group
    ps = page_size
    bk = pages_per_block * ps
    length = lengths_ref[b]

    def start_copy(dst_slot, block_idx):
        for i in range(pages_per_block):
            page = page_tbl_ref[b, block_idx * pages_per_block + i]
            pltpu.make_async_copy(
                k_pages_ref.at[page], k_buf.at[dst_slot, i], k_sem.at[dst_slot]
            ).start()
            pltpu.make_async_copy(
                v_pages_ref.at[page], v_buf.at[dst_slot, i], v_sem.at[dst_slot]
            ).start()
            if quant:
                pltpu.make_async_copy(
                    ks_ref.at[page], ks_buf.at[dst_slot, i], s_sem.at[dst_slot]
                ).start()
                pltpu.make_async_copy(
                    vs_ref.at[page], vs_buf.at[dst_slot, i], s_sem.at[dst_slot]
                ).start()

    def wait_copy(slot, block_idx):
        # Waits re-materialize each copy descriptor (the DMA semaphore's
        # increment is size-dependent; jax>=0.9 has no counted wait).
        for i in range(pages_per_block):
            page = page_tbl_ref[b, block_idx * pages_per_block + i]
            pltpu.make_async_copy(
                k_pages_ref.at[page], k_buf.at[slot, i], k_sem.at[slot]
            ).wait()
            pltpu.make_async_copy(
                v_pages_ref.at[page], v_buf.at[slot, i], v_sem.at[slot]
            ).wait()
            if quant:
                pltpu.make_async_copy(
                    ks_ref.at[page], ks_buf.at[slot, i], s_sem.at[slot]
                ).wait()
                pltpu.make_async_copy(
                    vs_ref.at[page], vs_buf.at[slot, i], s_sem.at[slot]
                ).wait()

    @pl.when(blk == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

        @pl.when(length > 0)
        def _():
            start_copy(0, 0)

    active = blk * bk < length

    def expand_scale(srow):  # [NKV, ps] -> [NH, ps] (rows kv-major)
        if group == 1:
            return srow
        return jnp.concatenate(
            [jnp.broadcast_to(srow[j : j + 1], (group, ps))
             for j in range(nkv)], axis=0,
        )

    @pl.when(active)
    def _run():
        slot = jax.lax.rem(blk, 2)

        @pl.when((blk + 1) * bk < length)
        def _prefetch():
            start_copy(jax.lax.rem(blk + 1, 2), blk + 1)

        wait_copy(slot, blk)
        q = q_ref[0].astype(jnp.bfloat16)  # [NH, KD] lane-packed
        parts = []
        for i in range(pages_per_block):
            si = jax.lax.dot(
                q, k_buf[slot, i].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [NH, ps]
            if quant:
                si = si * expand_scale(ks_buf[slot, i])
            parts.append(si)
        s = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + blk * bk
        s = jnp.where(pos < length, s, MASK_VALUE)

        m_prev = m_scr[...][:, :1]
        l_prev = l_scr[...][:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
        pv = acc_scr[...] * alpha
        for i in range(pages_per_block):
            pi = p[:, i * ps : (i + 1) * ps]
            if quant:
                pi = pi * expand_scale(vs_buf[slot, i])
            # v pages are [KD, ps]: contract the token axis (NT matmul).
            pv = pv + jax.lax.dot_general(
                pi.astype(jnp.bfloat16),
                v_buf[slot, i].astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_scr[...] = pv

    @pl.when(blk == num_blocks - 1)
    def _store():
        l = l_scr[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        acc = acc_scr[...]
        head = jax.lax.broadcasted_iota(jnp.int32, (nh, 1), 0) // group
        att = None
        for j in range(nkv):
            part = acc[:, j * hd : (j + 1) * hd] * (head == j)
            att = part if att is None else att + part
        o_ref[0] = (att * l_inv).astype(o_ref.dtype)


def paged_decode_attention(
    q: jax.Array,  # [B, 1, NH, HD]
    k_pages: jax.Array,  # [P, NKV, HD, ps] (page-major, transposed pages)
    v_pages: jax.Array,
    page_table: jax.Array,  # [B, W] int32
    seq_lens: jax.Array,  # [B] int32
    *,
    k_scale: Optional[jax.Array] = None,  # [P, NKV, ps] f32 (int8 KV pages)
    v_scale: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    pages_per_block: int = 4,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Paged KV decode attention. Returns [B, 1, NH, HD].

    One page = one contiguous [KD, ps] DMA covering every KV head (module
    doc). With ``k_scale``/``v_scale`` the pages hold int8 values and the
    kernel streams half the KV bytes plus tiny scale tiles.
    """
    B, one, NH, HD = q.shape
    P, NKV, _, ps = k_pages.shape
    W = page_table.shape[1]
    G = NH // NKV
    KD = NKV * HD
    sm_scale = 1.0 / math.sqrt(HD) if scale is None else scale
    quant = k_scale is not None

    interp = _interpret_default() if interpret is None else interpret
    if interp:
        # The DMA/semaphore path needs real hardware.
        from mila_tpu.inference.kv_cache import paged_decode_attention_ref

        kp = k_pages.transpose(0, 3, 1, 2)  # [P, ps, NKV, HD]
        vp = v_pages.transpose(0, 3, 1, 2)
        if quant:
            ks = k_scale.transpose(0, 2, 1)[..., None]  # [P, ps, NKV, 1]
            vs = v_scale.transpose(0, 2, 1)[..., None]
            kp = (kp.astype(jnp.float32) * ks).astype(q.dtype)
            vp = (vp.astype(jnp.float32) * vs).astype(q.dtype)
        return paged_decode_attention_ref(
            q, kp, vp, page_table, seq_lens, scale=sm_scale
        )

    from mila_tpu.kernels.dense_attention import pack_queries

    q_pk = pack_queries(q.reshape(B, NH, HD), NKV)  # [B, NH, KD]

    if W % pages_per_block:
        pad = pages_per_block - W % pages_per_block
        page_table = jnp.pad(page_table, ((0, 0), (0, pad)))
        W += pad
    num_blocks = W // pages_per_block
    grid = (B, num_blocks)

    k2 = k_pages.reshape(P, KD, ps)
    v2 = v_pages.reshape(P, KD, ps)
    in_specs = [
        pl.BlockSpec((1, NH, KD), lambda b, i, *_: (b, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    args = [q_pk, k2, v2]
    scratch = [
        pltpu.VMEM((2, pages_per_block, KD, ps), k_pages.dtype),
        pltpu.VMEM((2, pages_per_block, KD, ps), v_pages.dtype),
    ]
    if quant:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
        scratch += [
            pltpu.VMEM((2, pages_per_block, NKV, ps), jnp.float32),
            pltpu.VMEM((2, pages_per_block, NKV, ps), jnp.float32),
        ]
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if quant:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    scratch += [
        pltpu.VMEM((NH, 128), jnp.float32),
        pltpu.VMEM((NH, 128), jnp.float32),
        pltpu.VMEM((NH, KD), jnp.float32),
    ]

    out = pl.pallas_call(
        functools.partial(
            _paged_kernel,
            pages_per_block=pages_per_block,
            page_size=ps,
            num_blocks=num_blocks,
            sm_scale=sm_scale,
            nkv=NKV,
            group=G,
            hd=HD,
            quant=quant,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, NH, HD), lambda b, i, *_: (b, 0, 0)),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((B, NH, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(seq_lens.astype(jnp.int32), page_table.astype(jnp.int32), *args)

    return out.reshape(B, 1, NH, HD)
