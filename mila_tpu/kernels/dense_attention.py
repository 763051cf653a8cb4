"""Pallas dense-cache decode attention: contiguous KV slab streaming.

The XLA decode attention (ops.decode_attention) reads the dense cache at
~464 GB/s (benchmarks/r3_decomp.py) — the einsum materializes [B, NKV, G, T]
scores through HBM. This kernel streams the cache through VMEM once, with a
manual double-buffered DMA ring over T-chunks, and keeps every intermediate
in registers/VMEM. The per-token engine path keeps the paged kernel
(kernels/paged_attention.py); this one serves the dense-cache decode loop
(models forward_with_cache — the continuous-batching-free BASELINE bench
path and Generator).

GQA without relayouts: per sequence, scores are computed for EVERY
(query-head, kv-head) pair in one MXU dot — q [NH, HD] x kv-slab
[NKV*bt, HD]^T -> [NH, NKV*bt] — and the non-matching (n, h != kv(n)) pairs
are masked to -inf BEFORE the online softmax. Their probabilities exp to
exactly 0, so the AV dot over the full slab contracts to the block-diagonal
result with zero gather/slice work. The 8x FLOP overcount is free: decode
attention is KV-bandwidth-bound, the MXU idles either way.

Lane packing for HD < 128: Mosaic requires any ds-sliced memref's minor dim
to be a multiple of the 128-lane tile, so a [.., T, 64] cache cannot be
slab-sliced at all. The kernel therefore takes the cache as
[B, NKV, T/r, r*HD] (r = 128 // HD, a FREE row-major reshape at the call
site): r consecutive tokens share one 128-lane row. Inside, the r token
interleaves are split at the VALUE level (lane slices of loaded vectors,
which Mosaic does support) into r separate [NKV*bt/r, HD] operands — the
online softmax doesn't care that token order within a block is deinterleaved
as long as the position masks follow (col_t = r*row + interleave).

Cache layout [B, NKV, T, HD]: the new token's k/v insert with a single
dynamic_update_slice (no transpose), and a T-chunk slab is one strided DMA.

Correctness oracle: ops.decode_attention (tests/kernels/test_dense_attention.py).
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


def _dense_kernel(
    lens_ref,  # SMEM [B] int32
    q_ref,  # [B, NH, HD] VMEM
    k_hbm,  # [B, NKV, T/r, r*HD] HBM (lane-packed, r tokens per row)
    v_hbm,
    o_ref,  # [B, NH, HD]
    k_buf,  # VMEM [2, B, NKV, bt/r, r*HD]
    v_buf,
    k_sem,
    v_sem,
    m_scr,  # VMEM [B, NH, 1] f32
    l_scr,
    acc_scr,  # VMEM [B, NH, HD] f32
    *,
    block_t: int,
    num_blocks: int,
    sm_scale: float,
    batch: int,
    nkv: int,
    group: int,
    r: int,
    hd: int,
):
    blk = pl.program_id(0)
    rows = block_t // r  # packed rows per block per kv head

    def slab_copies(slot, idx):
        return (
            pltpu.make_async_copy(
                k_hbm.at[:, :, pl.ds(idx * rows, rows)],
                k_buf.at[slot],
                k_sem.at[slot],
            ),
            pltpu.make_async_copy(
                v_hbm.at[:, :, pl.ds(idx * rows, rows)],
                v_buf.at[slot],
                v_sem.at[slot],
            ),
        )

    def start_copy(slot, idx):
        for c in slab_copies(slot, idx):
            c.start()

    @pl.when(blk == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)
        start_copy(0, 0)

    slot = jax.lax.rem(blk, 2)

    @pl.when(blk + 1 < num_blocks)
    def _prefetch():
        start_copy(jax.lax.rem(blk + 1, 2), blk + 1)

    for c in slab_copies(slot, blk):
        c.wait()

    kv_cols = nkv * rows
    nh = nkv * group
    # Static masks for (query-head, kv-head) matching: packed-slab column c
    # belongs to kv head c // rows; query head n reads kv head n // group.
    col_h = jax.lax.broadcasted_iota(jnp.int32, (nh, kv_cols), 1) // rows
    row_h = jax.lax.broadcasted_iota(jnp.int32, (nh, kv_cols), 0) // group
    head_ok = col_h == row_h
    # Token position of packed row c, interleave j: r * (c % rows) + j.
    col_row = jax.lax.broadcasted_iota(jnp.int32, (nh, kv_cols), 1) % rows

    for b in range(batch):  # static unroll: B is small at decode
        length = lens_ref[b]
        kp = k_buf[slot, b].reshape(kv_cols, r * hd)
        vp = v_buf[slot, b].reshape(kv_cols, r * hd)
        q = q_ref[b].astype(jnp.bfloat16)  # [NH, HD]
        # Deinterleave at the value level: r lane-slices of [kv_cols, HD],
        # one scores dot + one pv dot per interleave. (Concatenating the
        # slices into one dot trips Mosaic: lane slices at different offsets
        # can't be concatenated along sublanes without an unsupported
        # relayout — "offset mismatch on non-concat dimension".)
        ss = []
        for j in range(r):
            kj = kp[:, j * hd : (j + 1) * hd]
            s = jax.lax.dot_general(
                q, kj.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [NH, kv_cols]
            tok = r * col_row + j + blk * block_t
            ss.append(jnp.where(head_ok & (tok < length), s, MASK_VALUE))

        m_prev = m_scr[b]  # [NH, 1]
        l_prev = l_scr[b]
        m_curr = ss[0].max(axis=1, keepdims=True)
        for s in ss[1:]:
            m_curr = jnp.maximum(m_curr, s.max(axis=1, keepdims=True))
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)

        l_new = alpha * l_prev
        pv = None
        for j, s in enumerate(ss):
            p = jnp.exp(s - m_next)
            l_new = l_new + jnp.sum(p, axis=1, keepdims=True)
            vj = vp[:, j * hd : (j + 1) * hd]
            d = jax.lax.dot(
                p.astype(jnp.bfloat16), vj.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )  # [NH, HD] — masked p rows are exactly 0 for foreign kv heads
            pv = d if pv is None else pv + d
        l_scr[b] = l_new
        m_scr[b] = m_next
        acc_scr[b] = acc_scr[b] * alpha + pv

    @pl.when(blk == num_blocks - 1)
    def _store():
        for b in range(batch):
            l = l_scr[b]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[b] = (acc_scr[b] * l_inv).astype(o_ref.dtype)


def dense_decode_attention(
    q: jax.Array,  # [B, 1, NH, HD] or [B, NH, HD]
    k_cache: jax.Array,  # [B, NKV, T, HD]
    v_cache: jax.Array,
    lens: jax.Array,  # [B] int32, valid entries incl. current token
    *,
    scale: Optional[float] = None,
    block_t: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Decode attention over a head-major dense KV cache. Returns q's shape."""
    squeeze = q.ndim == 4
    if squeeze:
        q = q.reshape(q.shape[0], q.shape[2], q.shape[3])
    B, NH, HD = q.shape
    _, NKV, T, _ = k_cache.shape
    G = NH // NKV
    sm_scale = 1.0 / math.sqrt(HD) if scale is None else scale

    interp = _interpret_default() if interpret is None else interpret
    if interp:
        # DMA/semaphore path needs hardware; oracle on CPU.
        from mila_tpu.ops.attention import decode_attention

        out = decode_attention(
            q[:, None], k_cache.transpose(0, 2, 1, 3),
            v_cache.transpose(0, 2, 1, 3), lens, scale=sm_scale,
        )
        return out if squeeze else out[:, 0]

    r = max(1, 128 // HD)  # tokens lane-packed per 128-lane row
    bt = min(block_t, T)
    while T % bt or bt % r:
        bt //= 2
    num_blocks = T // bt
    # Free row-major reshape: r consecutive tokens share one 128-lane row.
    k2 = k_cache.reshape(B, NKV, T // r, r * HD)
    v2 = v_cache.reshape(B, NKV, T // r, r * HD)

    out = pl.pallas_call(
        functools.partial(
            _dense_kernel,
            block_t=bt, num_blocks=num_blocks, sm_scale=sm_scale,
            batch=B, nkv=NKV, group=G, r=r, hd=HD,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_blocks,),
            in_specs=[
                # num_scalar_prefetch=1: index maps get (grid ids..., lens_ref)
                pl.BlockSpec((B, NH, HD), lambda i, *_: (0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((B, NH, HD), lambda i, *_: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, B, NKV, bt // r, r * HD), k_cache.dtype),
                pltpu.VMEM((2, B, NKV, bt // r, r * HD), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((B, NH, 1), jnp.float32),
                pltpu.VMEM((B, NH, 1), jnp.float32),
                pltpu.VMEM((B, NH, HD), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, NH, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * NH * T * HD,
            bytes_accessed=2 * B * NKV * T * HD * k_cache.dtype.itemsize,
            transcendentals=B * NH * T,
        ),
        interpret=False,
    )(lens.astype(jnp.int32), q, k2, v2)
    return out[:, None] if squeeze else out
