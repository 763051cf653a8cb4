"""Flash attention backward Pallas kernels (dQ and dK/dV).

Completes the manual-backward discipline for the attention kernel (the
reference hand-writes backward CUDA kernels for every op; SURVEY §2.5).
Standard flash-attention backward with saved row statistics:

    p_ij  = exp(s_ij − m_i) / l_i          (recomputed per tile from l, m)
    dv_j  = Σ_i p_ij · do_i
    ds_ij = p_ij ⊙ (do_i · v_j − D_i),  D_i = Σ_d do_id · o_id
    dq_i  = scale · Σ_j ds_ij k_j
    dk_j  = scale · Σ_i ds_ij q_i

Two kernels with transposed iteration orders: dKV fixes a KV tile and sweeps
Q tiles (accumulating dk, dv in VMEM); dQ fixes a Q tile and sweeps KV tiles.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _recompute_p(q, k, l_row, m_row, sm_scale, causal, q_start, kv_start):
    """p [bq, bk] from tiles + saved stats; masked entries are exactly 0."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_start
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_start
        s = jnp.where(cols <= rows, s, MASK_VALUE)
    l_safe = jnp.where(l_row == 0.0, 1.0, l_row)
    return jnp.exp(s - m_row[:, None]) / l_safe[:, None]


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, l_ref, m_ref, di_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, sm_scale: float, causal: bool, block_q: int, block_k: int,
    kv_offset: int,
):
    qi = pl.program_id(3)
    n_q = pl.num_programs(3)
    ki = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    run = True
    if causal:
        run = (qi + 1) * block_q - 1 + kv_offset >= ki * block_k

    @pl.when(run)
    def _run():
        # Native-dtype MXU dots (bf16 inputs stay bf16); f32 accumulate.
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        l_row = l_ref[0, 0][:, 0]
        m_row = m_ref[0, 0][:, 0]
        di = di_ref[0, 0][:, 0]
        p = _recompute_p(
            q, k, l_row, m_row, sm_scale, causal,
            qi * block_q + kv_offset, ki * block_k,
        )
        # dv += p^T @ do
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di[:, None]) * sm_scale
        # dk += ds^T @ q
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == n_q - 1)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, l_ref, m_ref, di_ref,
    dq_ref,
    dq_acc,
    *, sm_scale: float, causal: bool, block_q: int, block_k: int,
    kv_offset: int,
):
    ki = pl.program_id(3)
    n_k = pl.num_programs(3)
    qi = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    run = True
    if causal:
        run = (qi + 1) * block_q - 1 + kv_offset >= ki * block_k

    @pl.when(run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        p = _recompute_p(
            q, k, l_ref[0, 0][:, 0], m_ref[0, 0][:, 0], sm_scale, causal,
            qi * block_q + kv_offset, ki * block_k,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di_ref[0, 0][:, 0][:, None]) * sm_scale
        dq_acc[...] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(ki == n_k - 1)
    def _store():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def flash_attention_bwd(
    q: jax.Array,  # [B, NH, Tq, D] (head-major)
    k: jax.Array,  # [B, NKV, Tkv, D]
    v: jax.Array,
    o: jax.Array,  # [B, NH, Tq, D] forward output
    l: jax.Array,  # [B, NH, Tq, LANES] softmax row sums (lanes-padded)
    m: jax.Array,  # [B, NH, Tq, LANES] row maxima (lanes-padded)
    do: jax.Array,  # [B, NH, Tq, D] output cotangent
    *,
    causal: bool,
    sm_scale: float,
    kv_offset: int = 0,
    block_q: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
):
    """Returns (dq, dk, dv) with dk/dv summed over GQA groups.

    ``kv_offset`` shifts query positions for chunked prefill (q rows are
    global positions kv_offset..kv_offset+Tq-1 against the full KV span).
    """
    B, NH, Tq, D = q.shape
    NKV, Tkv = k.shape[1], k.shape[2]
    group = NH // NKV
    bq = min(block_q, Tq)
    bk = min(block_k, Tkv)
    while Tq % bq:
        bq //= 2
    while Tkv % bk:
        bk //= 2
    interp = (jax.default_backend() == "cpu") if interpret is None else interpret

    LANES = 128
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[..., None], (*di.shape, LANES))  # lanes-padded

    q_spec = pl.BlockSpec((1, 1, bq, D), lambda b, h, ki_, qi_: (b, h, qi_, 0))
    kv_spec = pl.BlockSpec(
        (1, 1, bk, D), lambda b, h, ki_, qi_, g=group: (b, h // g, ki_, 0)
    )
    row_spec = pl.BlockSpec((1, 1, bq, LANES), lambda b, h, ki_, qi_: (b, h, qi_, 0))

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, sm_scale=sm_scale, causal=causal, block_q=bq,
            block_k=bk, kv_offset=kv_offset,
        ),
        grid=(B, NH, Tkv // bk, Tq // bq),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec, row_spec],
        out_specs=(
            pl.BlockSpec((1, 1, bk, D), lambda b, h, ki_, qi_: (b, h, ki_, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, ki_, qi_: (b, h, ki_, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, NH, Tkv, D), jnp.float32),
            jax.ShapeDtypeStruct((B, NH, Tkv, D), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interp,
    )(q, k, v, do, l, m, di)

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, sm_scale=sm_scale, causal=causal, block_q=bq,
            block_k=bk, kv_offset=kv_offset,
        ),
        grid=(B, NH, Tq // bq, Tkv // bk),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, qi_, ki_: (b, h, qi_, 0)),
            pl.BlockSpec(
                (1, 1, bk, D), lambda b, h, qi_, ki_, g=group: (b, h // g, ki_, 0)
            ),
            pl.BlockSpec(
                (1, 1, bk, D), lambda b, h, qi_, ki_, g=group: (b, h // g, ki_, 0)
            ),
            pl.BlockSpec((1, 1, bq, D), lambda b, h, qi_, ki_: (b, h, qi_, 0)),
            pl.BlockSpec((1, 1, bq, LANES), lambda b, h, qi_, ki_: (b, h, qi_, 0)),
            pl.BlockSpec((1, 1, bq, LANES), lambda b, h, qi_, ki_: (b, h, qi_, 0)),
            pl.BlockSpec((1, 1, bq, LANES), lambda b, h, qi_, ki_: (b, h, qi_, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, qi_, ki_: (b, h, qi_, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NH, Tq, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interp,
    )(q, k, v, do, l, m, di)

    # GQA: per-q-head dk/dv reduce over the group onto shared KV heads.
    if group > 1:
        dk = dk.reshape(B, NKV, group, Tkv, D).sum(axis=2)
        dv = dv.reshape(B, NKV, group, Tkv, D).sum(axis=2)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)
