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
    # Blocks past max(lens) are skipped entirely — the cache is allocated
    # at max_seq_len but only lens rows are live; streaming (and computing
    # over) the rest was a 16x overread at bench shapes (VERDICT r4 weak 5).
    maxlen = lens_ref[0]
    for b in range(1, batch):
        maxlen = jnp.maximum(maxlen, lens_ref[b])

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

        @pl.when(maxlen > 0)
        def _():
            start_copy(0, 0)

    @pl.when(blk * block_t < maxlen)
    def _stream():
        slot = jax.lax.rem(blk, 2)

        @pl.when((blk + 1) * block_t < maxlen)
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
            ) * sm_scale  # [NH, bt] — true per-head logits (foreign lanes 0)
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
    if interp or (NKV * HD) % 128:
        # DMA/semaphore path needs hardware; oracle on CPU. Lane-packed
        # cache rows need NKV*HD to be a multiple of the 128-lane tile
        # (Mosaic rejects 64-lane memref slices) — small draft models
        # (e.g. the speculative-decode tiny draft, KD=64) take the XLA
        # path, which is faster at those sizes anyway.
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


# ---------------------------------------------------------------------------
# Fully fused decode attention: in-kernel RoPE + current-token attention.
#
# The two-kernel decode layer still left ~35us/layer of XLA glue (measured
# by benchmarks/decode_profile.py layer scaling): qkv split, two rope
# fusions, bf16 casts, and the packed-query einsum all dispatch between the
# Pallas calls. This entry moves rope and the just-computed token's
# attention contribution INSIDE the kernel:
#
#   - callers pass the raw fused qkv row (post rms+wqkv, PRE-rope) plus
#     full-width tiled rope tables (cos duplicated across halves, sin
#     pre-signed [-sin | sin]); the kernel ropes the lane-packed queries and
#     the new k with two lane-rolls + a select (split-half convention,
#     ops/rope.py:55-68);
#   - the dense cache is streamed only over the OLD tokens (< lens[b]);
#     blocks past max(lens) are skipped entirely (the cache is allocated at
#     max_seq_len but only `pos` rows are live — streaming the rest was
#     pure waste);
#   - the current token's score/value enter the online softmax in-register
#     at finalize time, AND the kernel writes the new k/v rows into the
#     cache ITSELF (the caches are aliased in-out refs; an XLA
#     dynamic_update_slice on a buffer a pallas call reads cannot alias and
#     silently copied the 8MB layer cache — ~35us/layer, benchmarks/
#     r4_layer.py).
#
# Returns (att [B, NH, HD], k_new [B, KD] roped, k_cache', v_cache') where
# the caches are the SAME buffers updated in place at row old_lens[b].
# ---------------------------------------------------------------------------


def _fused_kernel(
    lens_ref,  # SMEM [B] int32: number of OLD cache tokens per row
    q_ref,  # [B, NH, KD] VMEM lane-packed queries, PRE-rope
    qkv_ref,  # [B, NQ+2*KD] VMEM raw fused projection row
    cos_ref,  # [B, KD] f32, full-width tiled
    sin_ref,  # [B, KD] f32, pre-signed ([-sin | sin] per 64-lane group)
    k_hbm,  # [B, T, KD] HBM cache (aliased to the k_out ref; rows >=
    #         lens[b] are not read)
    v_hbm,
    o_ref,  # [B, NH, HD]
    kn_ref,  # [B, KD] roped new k
    ko_ref,  # [B, T, KD] ANY — aliased to k_hbm; row lens[b] written by
    #          the kernel itself (1-D row DMAs)
    vo_ref,
    k_buf,  # VMEM [2, B, bt, KD]
    v_buf,
    k_sem,
    v_sem,
    w_sem,  # write-back sem
    *rest,  # 2*B (8, KD) row-block buffers, then q_scr/kv_scr/m/l/acc
    block_t: int,
    num_blocks: int,
    sm_scale: float,
    batch: int,
    nkv: int,
    group: int,
    hd: int,
    nq: int,
):
    krow_scr = rest[:batch]
    vrow_scr = rest[batch : 2 * batch]
    (q_scr, kv_scr, m_scr, l_scr, acc_scr) = rest[2 * batch :]
    blk = pl.program_id(0)
    nh = nkv * group
    kd = nkv * hd
    maxlen = lens_ref[0]
    for b in range(1, batch):
        maxlen = jnp.maximum(maxlen, lens_ref[b])

    def blk_start(b):
        # Mosaic requires 8-row-aligned HBM DMA slices, so the insert is a
        # read-modify-write of the aligned 8-row block around lens[b].
        # Clamped to the last full block: at lens[b] == T (cache full) the
        # RMW degenerates to rewriting the final 8 rows unchanged (the new
        # row's rowid == 8 matches nothing) instead of an OOB HBM DMA.
        # Clamp BEFORE the //8*8 alignment: Mosaic's divisibility analysis
        # proves x//8*8 but not min(x*8, c).
        return (jnp.minimum(lens_ref[b], block_t * num_blocks - 1) // 8) * 8

    def row_reads():
        cps = []
        for b in range(batch):
            st = blk_start(b)
            cps.append(pltpu.make_async_copy(
                ko_ref.at[b, pl.ds(st, 8)], krow_scr[b], w_sem))
            cps.append(pltpu.make_async_copy(
                vo_ref.at[b, pl.ds(st, 8)], vrow_scr[b], w_sem))
        return cps

    def row_writes():
        # New k/v rows -> cache row lens[b] through the ALIASED out refs.
        # The written block's other 7 rows are rewritten with their own
        # bytes; the new row is masked out of this step's scores, so the
        # race with the streaming reads is benign.
        cps = []
        for b in range(batch):
            st = blk_start(b)
            cps.append(pltpu.make_async_copy(
                krow_scr[b], ko_ref.at[b, pl.ds(st, 8)], w_sem))
            cps.append(pltpu.make_async_copy(
                vrow_scr[b], vo_ref.at[b, pl.ds(st, 8)], w_sem))
        return cps

    def rope(x, c, s):
        lo = jnp.roll(x, -(hd // 2), axis=1)
        hi = jnp.roll(x, hd // 2, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        y = jnp.where(lane % hd < hd // 2, lo, hi)
        return x * c + y * s

    def slab_copies(slot, idx):
        return (
            pltpu.make_async_copy(
                k_hbm.at[:, pl.ds(idx * block_t, block_t)],
                k_buf.at[slot], k_sem.at[slot]),
            pltpu.make_async_copy(
                v_hbm.at[:, pl.ds(idx * block_t, block_t)],
                v_buf.at[slot], v_sem.at[slot]),
        )


    @pl.when(blk == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

        @pl.when(maxlen > 0)
        def _():
            for c in slab_copies(0, 0):
                c.start()

        # RoPE the packed queries and the new k; stash v.
        for b in range(batch):
            c = cos_ref[b][None, :]
            s = sin_ref[b][None, :]
            q_scr[b] = rope(q_ref[b].astype(jnp.float32), c, s).astype(
                jnp.bfloat16
            )
        kn = rope(qkv_ref[:, nq : nq + kd].astype(jnp.float32),
                  cos_ref[...], sin_ref[...])
        vn = qkv_ref[:, nq + kd : nq + 2 * kd]
        kv_scr[0] = kn.astype(kv_scr.dtype)
        kv_scr[1] = vn.astype(kv_scr.dtype)
        kn_ref[...] = kn.astype(kn_ref.dtype)
        for c in row_reads():
            c.start()
        for c in row_reads():
            c.wait()
        rowid = jax.lax.broadcasted_iota(jnp.int32, (8, kd), 0)
        for b in range(batch):
            r = lens_ref[b] - blk_start(b)
            k8 = jnp.where(
                rowid == r,
                jnp.broadcast_to(kn[b : b + 1], (8, kd)),
                krow_scr[b][...].astype(jnp.float32),
            )
            v8 = jnp.where(
                rowid == r,
                jnp.broadcast_to(vn[b : b + 1].astype(jnp.float32), (8, kd)),
                vrow_scr[b][...].astype(jnp.float32),
            )
            krow_scr[b][...] = k8.astype(krow_scr[b].dtype)
            vrow_scr[b][...] = v8.astype(vrow_scr[b].dtype)
        # The write-back overlaps the whole KV stream; awaited at finalize.
        for c in row_writes():
            c.start()

    active = blk * block_t < maxlen
    col_t = jax.lax.broadcasted_iota(jnp.int32, (nh, block_t), 1)

    @pl.when(active)
    def _stream():
        slot = jax.lax.rem(blk, 2)

        @pl.when((blk + 1) * block_t < maxlen)
        def _prefetch():
            for c in slab_copies(jax.lax.rem(blk + 1, 2), blk + 1):
                c.start()

        for c in slab_copies(slot, blk):
            c.wait()

        for b in range(batch):
            length = lens_ref[b]
            k = k_buf[slot, b]
            v = v_buf[slot, b]
            q = q_scr[b]
            s = jax.lax.dot_general(
                q, k.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale
            s = jnp.where(col_t + blk * block_t < length, s, MASK_VALUE)
            m_prev = m_scr[b]
            l_prev = l_scr[b]
            m_next = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_scr[b] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scr[b] = m_next
            pv = jax.lax.dot(
                p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            acc_scr[b] = acc_scr[b] * alpha + pv

    @pl.when(blk == num_blocks - 1)
    def _finalize():
        head = jax.lax.broadcasted_iota(jnp.int32, (nh, 1), 0) // group
        for b in range(batch):
            # Current token joins the online softmax in-register (its k/v
            # never round-trip through the cache for this step's read).
            kn = kv_scr[0, b : b + 1, :].astype(jnp.float32)  # [1, KD]
            vn = kv_scr[1, b : b + 1, :].astype(jnp.float32)
            # VPU multiply + lane-reduce (a [NH,1]-wide MXU dot trips a
            # Mosaic bf16 broadcast bug; this is equally cheap at NH=32).
            s_cur = jnp.sum(
                q_scr[b].astype(jnp.float32) * kn, axis=1, keepdims=True
            ) * sm_scale  # [NH, 1]
            m_fin = jnp.maximum(m_scr[b], s_cur)
            alpha = jnp.exp(m_scr[b] - m_fin)
            p_cur = jnp.exp(s_cur - m_fin)
            l = l_scr[b] * alpha + p_cur
            acc = acc_scr[b] * alpha + p_cur * vn
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            att = None
            for j in range(nkv):
                part = acc[:, j * hd : (j + 1) * hd] * (head == j)
                att = part if att is None else att + part
            o_ref[b] = (att * l_inv).astype(o_ref.dtype)
        for c in row_writes():
            c.wait()


def fused_decode_attention(
    qkv: jax.Array,  # [B, NQ + 2*NKV*HD] raw fused projection (pre-rope)
    q_pk: jax.Array,  # [B, NH, NKV*HD] lane-packed queries (pre-rope)
    cos_t: jax.Array,  # [B, NKV*HD] full-width tiled cos
    sin_t: jax.Array,  # [B, NKV*HD] pre-signed tiled sin
    k_cache: jax.Array,  # [B, T, NKV, HD] or stacked [L, B, T, NKV, HD]
    v_cache: jax.Array,
    old_lens: jax.Array,  # [B] int32: live cache rows (current token excl.)
    *,
    num_heads: int,
    scale: Optional[float] = None,
    block_t: int = 256,
    interpret: Optional[bool] = None,
):
    """In-kernel rope + dense-cache decode attention + cache write-back.

    The caches are ALIASED through the kernel: the returned k/v caches are
    the same (donated) buffers with row ``old_lens[b]`` holding the roped
    new k and raw v. The kernel is always ragged: per-row ``old_lens``
    insert positions with per-row ``cos_t``/``sin_t`` (continuous batching).

    Returns (att [B, NH, HD], k_new [B, NKV*HD] roped, k_cache', v_cache').
    """
    B, T, NKV, HD = k_cache.shape
    NH = num_heads
    KD = NKV * HD
    NQ = NH * HD
    G = NH // NKV
    sm_scale = 1.0 / math.sqrt(HD) if scale is None else scale

    interp = _interpret_default() if interpret is None else interpret
    if interp:
        return _fused_decode_attention_ref(
            qkv, cos_t, sin_t, k_cache, v_cache, old_lens,
            num_heads=NH, scale=sm_scale,
        )

    if T % 8:
        raise ValueError(
            f"fused_decode_attention needs T % 8 == 0 (got T={T}): the "
            "cache write-back is an aligned 8-row RMW (init_kv_cache "
            "rounds up)")
    bt = min(block_t, T)
    while T % bt:
        bt //= 2
    num_blocks = T // bt
    k2 = k_cache.reshape(B, T, KD)
    v2 = v_cache.reshape(B, T, KD)

    att, k_new, k_out, v_out = pl.pallas_call(
        functools.partial(
            _fused_kernel,
            block_t=bt, num_blocks=num_blocks, sm_scale=sm_scale,
            batch=B, nkv=NKV, group=G, hd=HD, nq=NQ,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((B, NH, KD), lambda i, *_: (0, 0, 0)),
                pl.BlockSpec((B, NQ + 2 * KD), lambda i, *_: (0, 0)),
                pl.BlockSpec((B, KD), lambda i, *_: (0, 0)),
                pl.BlockSpec((B, KD), lambda i, *_: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=(
                pl.BlockSpec((B, NH, HD), lambda i, *_: (0, 0, 0)),
                pl.BlockSpec((B, KD), lambda i, *_: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, B, bt, KD), k_cache.dtype),
                pltpu.VMEM((2, B, bt, KD), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
                *[pltpu.VMEM((8, KD), k_cache.dtype) for _ in range(2 * B)],
                pltpu.VMEM((B, NH, KD), jnp.bfloat16),
                pltpu.VMEM((2, B, KD), k_cache.dtype),
                pltpu.VMEM((B, NH, 1), jnp.float32),
                pltpu.VMEM((B, NH, 1), jnp.float32),
                pltpu.VMEM((B, NH, KD), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, NH, HD), qkv.dtype),
            jax.ShapeDtypeStruct((B, KD), qkv.dtype),
            jax.ShapeDtypeStruct((B, T, KD), k_cache.dtype),
            jax.ShapeDtypeStruct((B, T, KD), v_cache.dtype),
        ),
        # args: [lens, q_pk, qkv, cos, sin, k2, v2] — k2/v2 (indices 5, 6)
        # alias outputs 2/3: the kernel writes the new rows in place.
        input_output_aliases={5: 2, 6: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * NH * T * KD,
            bytes_accessed=2 * B * T * KD * k_cache.dtype.itemsize,
            transcendentals=B * NH * T,
        ),
        interpret=False,
    )(old_lens.astype(jnp.int32), q_pk, qkv, cos_t.astype(jnp.float32),
      sin_t.astype(jnp.float32), k2, v2)
    # Scatter the new rows into the ALIASED pass-through buffers. Because
    # the kernel owns the caches via input_output_aliases, the original
    # operands are dead here and the scatter updates in place (an XLA DUS
    # against a buffer a pallas call READS cannot alias and copied
    # 8MB/layer — benchmarks/r4_layer.py).
    return (att, k_new, k_out.reshape(B, T, NKV, HD),
            v_out.reshape(B, T, NKV, HD))


def _fused_decode_attention_ref(qkv, cos_t, sin_t, k_cache, v_cache,
                                old_lens, *, num_heads, scale):
    """jnp oracle (CPU interpret path): rope via the tiled tables, then
    decode attention over old cache + the current token."""
    from mila_tpu.ops.attention import decode_attention

    B, T, NKV, HD = k_cache.shape
    KD = NKV * HD
    NQ = num_heads * HD

    def rope_flat(x, c, s):
        xg = x.reshape(*x.shape[:-1], x.shape[-1] // HD, HD)
        y = jnp.concatenate([xg[..., HD // 2:], xg[..., : HD // 2]], axis=-1)
        y = y.reshape(x.shape)
        return (x.astype(jnp.float32) * c + y.astype(jnp.float32) * s).astype(
            x.dtype
        )

    q = qkv[:, :NQ]
    k_new = rope_flat(qkv[:, NQ : NQ + KD], cos_t, sin_t)
    v_new = qkv[:, NQ + KD :]
    # q uses the same per-position tables tiled across NH heads
    cq = jnp.tile(cos_t[:, :HD], (1, num_heads))
    sq = jnp.tile(sin_t[:, :HD], (1, num_heads))
    q = rope_flat(q, cq, sq)

    # Assemble [old cache + current] per row at position old_lens[b].
    kc = k_cache.reshape(B, T, KD)
    vc = v_cache.reshape(B, T, KD)
    rows = jnp.arange(B)
    kc = kc.at[rows, old_lens].set(k_new.astype(kc.dtype))
    vc = vc.at[rows, old_lens].set(v_new.astype(vc.dtype))
    out = decode_attention(
        q.reshape(B, 1, num_heads, HD),
        kc.reshape(B, T, NKV, HD),
        vc.reshape(B, T, NKV, HD),
        old_lens + 1,
        scale=scale,
    )
    return (out[:, 0], k_new, kc.reshape(B, T, NKV, HD),
            vc.reshape(B, T, NKV, HD))
