"""Pallas flash attention (forward) for TPU: causal, GQA, online softmax.

Replaces the reference's materialized [B,NH,T,T] MHA pipeline
(Kernels/CudaMHA.cu:29-80 — permute → batched QK^T → fused scale+causal
softmax → AV) with a tiled kernel that never materializes the scores matrix:
online softmax statistics (m, l) and the output accumulator live in VMEM
scratch across KV tiles (the flash-attention construction; see the TPU
attention guide). GQA maps query-head groups onto shared KV heads inside the
BlockSpec index maps — zero extra copies.

Backward: custom_vjp dispatches to the Pallas backward kernels in
:mod:`mila_tpu.kernels.flash_attention_bwd` (separate dKV and dQ kernels
driven by the saved l/m residuals; the kv_offset-shifted causal mask used by
chunked prefill is honored in both).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mila_tpu.ops.attention import dot_product_attention as _jnp_reference

# -0.7×f32max, not -inf: exp(-inf − -inf) would NaN (guide §5).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NUM_LANES = 128


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def _fa_kernel(
    q_ref, k_ref, v_ref,  # [1, 1, bq, d], [1, 1, bk, d], [1, 1, bk, d]
    o_ref,  # [1, 1, bq, d]
    l_ref, m_ref,  # [1, 1, bq, LANES] row statistics (None in inference)
    m_scr, l_scr, acc_scr,  # VMEM scratch [bq, LANES], [bq, LANES], [bq, d]
    *,
    causal: bool,
    sm_scale: float,
    kv_seq_len: int,
    block_q: int,
    block_k: int,
    kv_offset: int,
):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    # Tile-level causal skip: tile is entirely above the diagonal when its
    # first kv position exceeds the last q position (+offset).
    if causal:
        should_run = (q_idx + 1) * block_q - 1 + kv_offset >= kv_idx * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        # MXU dots run at the INPUT dtype (bf16 ~4x the f32 rate on v5e);
        # keep q/k native and accumulate f32 — only softmax math is f32.
        q = q_ref[0, 0]  # [bq, d]
        k = k_ref[0, 0]  # [bk, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk] f32
        if sm_scale != 1.0:
            s = s * sm_scale

        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * block_q + kv_offset
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
            s = jnp.where(cols <= rows, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]  # [bq, LANES] (max broadcast across lanes)
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)  # [bq, LANES]
        p = jnp.exp(s - m_next[:, :1])  # [bq, bk] (lane 0 holds the max)
        l_corr = alpha * l_prev
        l_next = l_corr + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
        )
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[0, 0]  # [bk, d] native dtype
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        l = l_scr[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        if l_ref is not None:
            l_ref[0, 0] = l_scr[...]
            m_ref[0, 0] = m_scr[...]


def _fa_kernel_t(
    q_ref, k_ref, v_ref,  # [1, 1, bq, d], [1, 1, bk, d], [1, 1, bk, d]
    o_ref,  # [1, 1, bq, d]
    l_ref, m_ref,  # [1, 1, bq, LANES] row statistics (lanes-padded)
    m_scr, l_scr, acc_scr,  # VMEM [8, bq], [8, bq], [d, bq] f32
    *,
    causal: bool,
    sm_scale: float,
    kv_seq_len: int,
    block_q: int,
    block_k: int,
    kv_offset: int,
):
    """Transposed-layout flash step for head_dim < 128.

    With D=64 the classic layout runs BOTH dots at half MXU width (QK^T
    contracts over D; PV outputs D lanes). Computing s^T = K·Q^T and
    out^T = V^T·P^T keeps the PV contraction over block_k (full 128 width)
    and its output over block_q lanes — PV at full MXU rate, one [d, bq]
    transpose per q tile at store time. Scores/stats live as [*, bq] rows
    (lane-major), so the online-softmax VPU math is lane-wise.
    """
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    if causal:
        should_run = (q_idx + 1) * block_q - 1 + kv_offset >= kv_idx * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]  # [bq, d]
        k = k_ref[0, 0]  # [bk, d]
        # s^T = k @ q^T: contraction over D, output lanes = bq (full width).
        s = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, bq] f32
        if sm_scale != 1.0:
            s = s * sm_scale

        if causal:
            kv_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + kv_idx * block_k
            q_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + q_idx * block_q + kv_offset
            s = jnp.where(kv_pos <= q_pos, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[0:1]  # [1, bq]
        l_prev = l_scr[0:1]
        m_curr = jnp.max(s, axis=0, keepdims=True)  # [1, bq]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)  # [1, bq]
        p = jnp.exp(s - m_next)  # [bk, bq]
        m_scr[0:1] = m_next
        l_scr[0:1] = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)

        v = v_ref[0, 0]  # [bk, d]
        # out^T += v^T @ p^T: contraction over bk (full MXU width), output
        # lanes = bq (full width) — no transposes, dims contract in place.
        pv = jax.lax.dot_general(
            v, p.astype(v.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [d, bq]
        acc_scr[...] = acc_scr[...] * alpha + pv  # alpha broadcasts over d

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        l = l_scr[0:1]  # [1, bq]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).T.astype(o_ref.dtype)
        if l_ref is not None:
            l_ref[0, 0] = jnp.broadcast_to(l_scr[0:1].T, (block_q, NUM_LANES))
            m_ref[0, 0] = jnp.broadcast_to(m_scr[0:1].T, (block_q, NUM_LANES))


def _flash_attention_forward(
    q: jax.Array,  # [B, NH, Tq, D]
    k: jax.Array,  # [B, NKV, Tkv, D]
    v: jax.Array,
    causal: bool,
    sm_scale: float,
    kv_offset: int,
    block_q: int,
    block_k: int,
    interpret: Optional[bool],
    save_stats: bool = True,
) -> jax.Array:
    """``save_stats=False`` (the inference/primal path) skips the l/m row-stat
    outputs entirely: they are lanes-padded to [Tq, 128] f32 for Mosaic block
    alignment, which at prefill shapes writes more HBM bytes than the whole
    attention compute floor (e.g. 268MB at B=4/NH=32/T=2048). Only the
    backward pass reads them."""
    B, NH, Tq, D = q.shape
    _, NKV, Tkv, _ = k.shape
    group = NH // NKV

    block_q = min(block_q, Tq)
    block_k = min(block_k, Tkv)
    if Tq % block_q or Tkv % block_k:
        raise ValueError(
            f"seq lens (q={Tq}, kv={Tkv}) must divide block sizes ({block_q}, {block_k})"
        )
    grid = (B, NH, Tq // block_q, Tkv // block_k)

    # Transposed PV layout wins when D < 128 (see _fa_kernel_t docstring);
    # at D >= 128 the classic layout already runs both dots full-width.
    transposed = D < 128
    base = functools.partial(
        _fa_kernel_t if transposed else _fa_kernel,
        causal=causal,
        sm_scale=sm_scale,
        kv_seq_len=Tkv,
        block_q=block_q,
        block_k=block_k,
        kv_offset=kv_offset,
    )
    if save_stats:
        kernel = base
        out_shape = (
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            # Row stats carry a lanes axis (Mosaic block alignment); the
            # backward kernels read column 0.
            jax.ShapeDtypeStruct((B, NH, Tq, NUM_LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, NH, Tq, NUM_LANES), jnp.float32),
        )
        out_specs = (
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, NUM_LANES), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, NUM_LANES), lambda b, h, qi, ki: (b, h, qi, 0)),
        )
    else:

        def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
            base(q_ref, k_ref, v_ref, o_ref, None, None, m_scr, l_scr, acc_scr)

        out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
        out_specs = pl.BlockSpec(
            (1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)
        )
    flops_per = 4 * Tq * Tkv * D  # QK^T + PV, both 2*T*T*D
    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_k, D),
                lambda b, h, qi, ki, g=group: (b, h // g, ki, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, D),
                lambda b, h, qi, ki, g=group: (b, h // g, ki, 0),
            ),
        ],
        out_specs=out_specs,
        scratch_shapes=(
            [
                pltpu.VMEM((8, block_q), jnp.float32),
                pltpu.VMEM((8, block_q), jnp.float32),
                pltpu.VMEM((D, block_q), jnp.float32),
            ]
            if transposed
            else [
                pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
                pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * NH * flops_per,
            bytes_accessed=(q.size + k.size * group + v.size * group + q.size)
            * q.dtype.itemsize,
            transcendentals=B * NH * Tq * Tkv,
        ),
        interpret=_interpret_default() if interpret is None else interpret,
    )(q, k, v)
    if save_stats:
        return res
    return res, None, None


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8)
)
def _flash_attention(
    q, k, v, causal, sm_scale, kv_offset, block_q, block_k, interpret
):
    # Primal (not-under-grad) path: skip the l/m stat outputs — they exist
    # only for the backward kernels and cost real HBM write bandwidth.
    out, _, _ = _flash_attention_forward(
        q, k, v, causal, sm_scale, kv_offset, block_q, block_k, interpret,
        save_stats=False,
    )
    return out


def _fa_fwd(q, k, v, causal, sm_scale, kv_offset, block_q, block_k, interpret):
    out, l, m = _flash_attention_forward(
        q, k, v, causal, sm_scale, kv_offset, block_q, block_k, interpret
    )
    return out, (q, k, v, out, l, m)


def _fa_bwd(causal, sm_scale, kv_offset, block_q, block_k, interpret, res, g):
    q, k, v, o, l, m = res
    # Dedicated Pallas backward kernels using the saved (l, m) stats;
    # kv_offset (chunked prefill) shifts the causal mask inside the kernels.
    from mila_tpu.kernels.flash_attention_bwd import flash_attention_bwd

    return flash_attention_bwd(
        q, k, v, o, l, m, g,
        causal=causal, sm_scale=sm_scale, kv_offset=kv_offset,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )


_flash_attention.defvjp(_fa_fwd, _fa_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    scale: Optional[float] = None,
    kv_offset: int = 0,
    # Defaults from the v5e block sweep: 512x512 ⇒ 3.8x XLA attention at
    # T=2048 (53.8 causal-TFLOP/s vs 14.1).
    block_q: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Drop-in replacement for :func:`mila_tpu.ops.dot_product_attention`.

    q: [B, Tq, NH, D]; k, v: [B, Tkv, NKV, D] → [B, Tq, NH, D].
    Falls back to the jnp reference for shapes too small/ragged to tile.
    """
    B, Tq, NH, D = q.shape
    _, Tkv, NKV, _ = k.shape
    if NH % NKV != 0:
        raise ValueError(f"num_heads {NH} not divisible by num_kv_heads {NKV}")
    sm_scale = 1.0 / math.sqrt(D) if scale is None else scale

    # Tiling gates: sublane multiple on Tq, lane multiple on Tkv, and a
    # 64-multiple head dim (64 pads to one lane tile; 128+ is native).
    if Tq % 16 or Tkv % NUM_LANES or D % 64:
        return _jnp_reference(
            q, k, v, causal=causal, scale=sm_scale, kv_offset=kv_offset
        )
    bq = min(block_q, Tq)
    bk = min(block_k, Tkv)
    while Tq % bq:
        bq //= 2
    while Tkv % bk:
        bk //= 2

    qt = q.transpose(0, 2, 1, 3)  # [B, NH, Tq, D]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _flash_attention(
        qt, kt, vt, causal, sm_scale, kv_offset, bq, bk, interpret
    )
    return out.transpose(0, 2, 1, 3)


def flash_mha_qkv(qkv: jax.Array, num_heads: int, *, causal: bool = True) -> jax.Array:
    """Fused-QKV convenience wrapper (Mila Attention component contract)."""
    B, T, C3 = qkv.shape
    C = C3 // 3
    HS = C // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = flash_attention(
        q.reshape(B, T, num_heads, HS),
        k.reshape(B, T, num_heads, HS),
        v.reshape(B, T, num_heads, HS),
        causal=causal,
    )
    return out.reshape(B, T, C)
