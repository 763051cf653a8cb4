"""Pallas dense-cache decode attention: contiguous KV slab streaming.

The XLA decode attention (ops.decode_attention) reads the dense cache at
~464 GB/s (benchmarks/r3_decomp.py) — the einsum materializes [B, NKV, G, T]
scores through HBM. This kernel streams the cache through VMEM once, with a
manual double-buffered DMA ring over T-chunks, and keeps every intermediate
in registers/VMEM.

Cache layout is TOKEN-major [B, T, NKV, HD] — the same layout the model
writes, so the per-token cache insert is one contiguous
dynamic_update_slice (the r3 head-major experiment made the insert a
64-lane strided scatter that cost ~64us/layer in XLA). The kernel views the
cache as [B, T, NKV*HD] (a free row-major reshape): a T-slab
cache[:, t0:t0+bt] is one DMA with a fully 128-aligned minor dim, which is
also the only slab shape Mosaic's memref slicing accepts for HD < 128.

GQA without relayouts — lane-packed queries: the caller provides
q_pk [B, NH, NKV*HD] where query head n carries its q vector in the lane
range of its kv head (kv(n) = n // group) and ZEROS elsewhere. One MXU dot
q_pk[b] @ slab^T then contracts the full NKV*HD lanes: foreign heads'
lanes contribute exactly 0, so scores [NH, bt] are the true per-head
logits with NO head masking and NO 8x softmax overcount. The pv dot
produces [NH, NKV*HD] whose valid lanes are selected per head with 0/1
indicator rows at the end (8 lane-slices, VPU-cheap).

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


def pack_queries(q: jax.Array, nkv: int) -> jax.Array:
    """[..., NH, HD] -> [..., NH, NKV*HD]: head n's vector lands in its kv
    head's lane range, zeros elsewhere (see module doc). Tiny XLA glue."""
    *lead, NH, HD = q.shape
    group = NH // nkv
    onehot = jax.nn.one_hot(
        jnp.arange(NH) // group, nkv, dtype=q.dtype
    )  # [NH, NKV]
    qj = jnp.einsum("...nd,nj->...njd", q, onehot)
    return qj.reshape(*lead, NH, nkv * HD)


def _dense_kernel(
    lens_ref,  # SMEM [B] int32
    q_ref,  # [B, NH, NKV*HD] VMEM (lane-packed queries)
    k_hbm,  # [B, T, NKV*HD] HBM
    v_hbm,
    o_ref,  # [B, NH, HD]
    k_buf,  # VMEM [2, B, bt, NKV*HD]
    v_buf,
    k_sem,
    v_sem,
    m_scr,  # VMEM [B, NH, 1] f32
    l_scr,
    acc_scr,  # VMEM [B, NH, NKV*HD] f32
    *,
    block_t: int,
    num_blocks: int,
    sm_scale: float,
    batch: int,
    nkv: int,
    group: int,
    hd: int,
):
    blk = pl.program_id(0)
    nh = nkv * group

    def slab_copies(slot, idx):
        return (
            pltpu.make_async_copy(
                k_hbm.at[:, pl.ds(idx * block_t, block_t)],
                k_buf.at[slot], k_sem.at[slot]),
            pltpu.make_async_copy(
                v_hbm.at[:, pl.ds(idx * block_t, block_t)],
                v_buf.at[slot], v_sem.at[slot]),
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

    col_t = jax.lax.broadcasted_iota(jnp.int32, (nh, block_t), 1)

    for b in range(batch):  # static unroll: B is small at decode
        length = lens_ref[b]
        k = k_buf[slot, b]  # [bt, NKV*HD]
        v = v_buf[slot, b]
        q = q_ref[b].astype(jnp.bfloat16)  # [NH, NKV*HD]

        s = jax.lax.dot_general(
            q, k.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [NH, bt] — true per-head logits (foreign lanes are 0)
        s = jnp.where(col_t + blk * block_t < length, s, MASK_VALUE)

        m_prev = m_scr[b]  # [NH, 1]
        l_prev = l_scr[b]
        m_next = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_scr[b] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[b] = m_next
        pv = jax.lax.dot(
            p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # [NH, NKV*HD]; head n's answer lives in its kv head's lanes
        acc_scr[b] = acc_scr[b] * alpha + pv

    @pl.when(blk == num_blocks - 1)
    def _store():
        # Per-head lane selection: att[n] = acc[n, kv(n)*HD : (kv(n)+1)*HD].
        head = jax.lax.broadcasted_iota(jnp.int32, (nh, 1), 0) // group
        for b in range(batch):
            l = l_scr[b]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            acc = acc_scr[b]
            att = None
            for j in range(nkv):
                part = acc[:, j * hd : (j + 1) * hd] * (head == j)
                att = part if att is None else att + part
            o_ref[b] = (att * l_inv).astype(o_ref.dtype)


def dense_decode_attention(
    q: jax.Array,  # [B, 1, NH, HD] or [B, NH, HD]
    k_cache: jax.Array,  # [B, T, NKV, HD] (token-major, the write layout)
    v_cache: jax.Array,
    lens: jax.Array,  # [B] int32, valid entries incl. current token
    *,
    scale: Optional[float] = None,
    block_t: int = 128,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Decode attention over the dense KV cache. Returns q's shape."""
    squeeze = q.ndim == 4
    if squeeze:
        q = q.reshape(q.shape[0], q.shape[2], q.shape[3])
    B, NH, HD = q.shape
    _, T, NKV, _ = k_cache.shape
    G = NH // NKV
    sm_scale = 1.0 / math.sqrt(HD) if scale is None else scale

    interp = _interpret_default() if interpret is None else interpret
    if interp:
        # DMA/semaphore path needs hardware; oracle on CPU.
        from mila_tpu.ops.attention import decode_attention

        out = decode_attention(q[:, None], k_cache, v_cache, lens,
                               scale=sm_scale)
        return out if squeeze else out[:, 0]

    bt = min(block_t, T)
    while T % bt:
        bt //= 2
    num_blocks = T // bt
    kd = NKV * HD
    k2 = k_cache.reshape(B, T, kd)  # free row-major reshapes
    v2 = v_cache.reshape(B, T, kd)
    q_pk = pack_queries(q, NKV)

    out = pl.pallas_call(
        functools.partial(
            _dense_kernel,
            block_t=bt, num_blocks=num_blocks, sm_scale=sm_scale,
            batch=B, nkv=NKV, group=G, hd=HD,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_blocks,),
            in_specs=[
                # num_scalar_prefetch=1: index maps get (grid ids..., lens_ref)
                pl.BlockSpec((B, NH, kd), lambda i, *_: (0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((B, NH, HD), lambda i, *_: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, B, bt, kd), k_cache.dtype),
                pltpu.VMEM((2, B, bt, kd), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((B, NH, 1), jnp.float32),
                pltpu.VMEM((B, NH, 1), jnp.float32),
                pltpu.VMEM((B, NH, kd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, NH, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * NH * T * NKV * HD,
            bytes_accessed=2 * B * NKV * T * HD * k_cache.dtype.itemsize,
            transcendentals=B * NH * T,
        ),
        interpret=False,
    )(lens.astype(jnp.int32), q_pk, k2, v2)
    return out[:, None] if squeeze else out
