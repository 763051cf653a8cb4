"""Fused decode-shape kernels: RMSNorm/residual/SwiGLU folded into the
weight-only dequant+matmul stream.

At decode batch sizes the Llama step is a pure HBM weight stream
(kernels/quant_matmul.py); everything *between* the matmuls — RMSNorm,
residual adds, the SwiGLU gate — is tiny but each op is a separate device
launch plus an HBM round-trip of the [B, H] activations. These kernels fold
them into the matmul prologue/epilogue so a decoder layer runs as four
weight-streaming Pallas calls:

    rms_quant_linear(x, g_attn, wqkv)          # norm -> qkv projection
    quant_linear_residual(att, wo, x)          # out proj + residual add
    rms_quant_linear_swiglu(x, g_mlp, wgu)     # norm -> gate|up -> silu(g)*u
    quant_linear_residual(h, down, x)          # down proj + residual add

and the head as `rms_quant_linear(x, g_final, lm_head_q)`.

Parity anchor: the reference fuses its Linear epilogue the same way via
cuBLASLt CUBLASLT_EPILOGUE_BIAS plans (CudaLinearOp.ixx:147-225); here the
epilogue set is what the Llama decode path needs (no-bias residual/swiglu).

Inference-only (no VJPs): these run inside the jitted decode step, never
under grad.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mila_tpu.inference.quantize import QTensor, quant_linear_ref
from mila_tpu.kernels.quant_matmul import (
    _DECODE_TILE_BYTES,
    _load_w,
    _pick_blocks,
    _tile_budget,
    _w_scale_fixup,
)


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


# Full-residency budget for the activation row block: [M, K] bf16 must sit in
# VMEM next to the streaming weight tiles.
_X_RESIDENT_BYTES = 1024 * 1024


def _rstd(x32: jax.Array, eps: float) -> jax.Array:
    return jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)


# ---------------------------------------------------------------------------
# rms_quant_linear: y = (rmsnorm(x) * gamma) @ dequant(W)
# ---------------------------------------------------------------------------

def _rms_qmm_kernel(
    x_ref,  # [M, K] resident activations
    g_ref,  # [1, K] f32 gamma
    w_ref,  # [bk, bn]
    s_ref,  # [1, bn] scale row
    o_ref,  # [M, bn]
    acc_ref,  # VMEM [M, bn] f32
    *,
    n_k: int,
    block_k: int,
    eps: float,
    scale_fix: float = 1.0,
):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    rstd = _rstd(x_ref[...].astype(jnp.float32), eps)  # [M, 1]
    xt = x_ref[:, pl.ds(ki * block_k, block_k)].astype(jnp.float32)
    gt = g_ref[0, pl.ds(ki * block_k, block_k)]
    xs = xt * rstd * gt[None, :]
    w = _load_w(w_ref[...])
    partial = jax.lax.dot(
        xs.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
    s = s_ref[0]
    if scale_fix != 1.0:
        s = s * scale_fix
    acc_ref[...] += partial * s[None, :]

    @pl.when(ki == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def rms_quant_linear(
    x: jax.Array,
    gamma: jax.Array,
    qt: QTensor,
    *,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused rmsnorm(x, gamma) @ dequant(qt) for decode shapes (M <= 32)."""
    K = qt.packed_rows or qt.q.shape[0]  # int4 packs two K rows per byte
    N = qt.q.shape[1]
    orig_shape = x.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    bn, bk = _pick_blocks(M, K, N, 1024, 512, qt.block_size,
                          budget=_tile_budget(qt.q.dtype))
    while N % bn:
        bn //= 2
    while K % bk or qt.block_size % bk:
        bk //= 2
    ok = (
        M <= 32
        and bn >= 128
        and bk >= 128
        and M * K * 2 <= _X_RESIDENT_BYTES
        and jnp.dtype(qt.q.dtype).itemsize == 1
        and not qt.packed_rows
    )
    if not ok:
        from mila_tpu.kernels.quant_matmul import quant_linear
        from mila_tpu.ops.rmsnorm import rms_norm

        # quant_linear keeps packed-int4 weights on the Pallas nibble kernel.
        out = quant_linear(rms_norm(x2, gamma, eps), qt,
                           interpret=interpret)
        return out.reshape(*orig_shape[:-1], N)

    n_k = K // bk
    grid = (N // bn, n_k)
    out = pl.pallas_call(
        functools.partial(_rms_qmm_kernel, n_k=n_k, block_k=bk, eps=eps,
                          scale_fix=_w_scale_fixup(qt.q.dtype)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda ni, ki: (0, 0)),
            pl.BlockSpec((1, K), lambda ni, ki: (0, 0)),
            pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni)),
            pl.BlockSpec(
                (1, bn),
                lambda ni, ki, _bk=bk, _qb=qt.block_size: ((ki * _bk) // _qb, ni),
            ),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda ni, ki: (0, ni)),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N * qt.q.dtype.itemsize + M * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret_default() if interpret is None else interpret,
    )(x2, gamma.reshape(1, K).astype(jnp.float32), qt.q, qt.scale)
    return out.reshape(*orig_shape[:-1], N)


# ---------------------------------------------------------------------------
# rms_quant_linear_argmax: greedy head — token = argmax(rmsnorm(x) @ W) with
# the argmax fused into the weight-stream epilogue. XLA's argmax over a
# [B, 129k] logits row costs ~62 us on v5e (benchmarks/r3_decomp.py); here
# each N tile updates a running (max, index) pair in VMEM for ~nothing, and
# the [B, vocab] logits never round-trip HBM.
# ---------------------------------------------------------------------------

def _rms_qmm_argmax_kernel(
    x_ref,  # [M, K] resident activations
    g_ref,  # [1, K] f32 gamma
    w_ref,  # [bk, bn]
    s_ref,  # [1, bn] scale row
    o_ref,  # [M, 1] int32 token ids
    acc_ref,  # VMEM [M, bn] f32
    bv_ref,  # VMEM [M, 1] f32 running best value
    bi_ref,  # VMEM [M, 1] int32 running best index
    *,
    n_k: int,
    n_n: int,
    block_n: int,
    block_k: int,
    vocab: int,
    eps: float,
    scale_fix: float = 1.0,
):
    ni = pl.program_id(0)
    ki = pl.program_id(1)

    @pl.when((ni == 0) & (ki == 0))
    def _init_best():
        bv_ref[...] = jnp.full(bv_ref.shape, -jnp.inf, jnp.float32)
        bi_ref[...] = jnp.zeros(bi_ref.shape, jnp.int32)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    rstd = _rstd(x_ref[...].astype(jnp.float32), eps)
    xt = x_ref[:, pl.ds(ki * block_k, block_k)].astype(jnp.float32)
    gt = g_ref[0, pl.ds(ki * block_k, block_k)]
    xs = xt * rstd * gt[None, :]
    w = _load_w(w_ref[...])
    partial = jax.lax.dot(
        xs.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
    s = s_ref[0]
    if scale_fix != 1.0:
        s = s * scale_fix
    acc_ref[...] += partial * s[None, :]

    @pl.when(ki == n_k - 1)
    def _update_best():
        logits = acc_ref[...]  # [M, bn] f32
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + ni * block_n
        logits = jnp.where(col < vocab, logits, -jnp.inf)  # padded vocab tail
        val = jnp.max(logits, axis=1, keepdims=True)
        idx = jnp.argmax(logits, axis=1).astype(jnp.int32)[:, None] + ni * block_n
        better = val > bv_ref[...]  # strict: first occurrence wins ties
        bv_ref[...] = jnp.where(better, val, bv_ref[...])
        bi_ref[...] = jnp.where(better, idx, bi_ref[...])

        @pl.when(ni == n_n - 1)
        def _store():
            o_ref[...] = bi_ref[...]


def rms_quant_linear_argmax(
    x: jax.Array,
    gamma: jax.Array,
    qt: QTensor,
    *,
    vocab_size: int,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> Optional[jax.Array]:
    """Greedy-decode head: argmax over rmsnorm(x, gamma) @ dequant(qt),
    argmax fused into the stream. Returns [..., 1] int32 token ids, or None
    when the shape doesn't fit the decode kernel (caller falls back to
    rms_quant_linear + jnp.argmax).

    The running max compares exact f32 accumulator values (the unfused path
    argmaxes bf16-rounded logits — near-ties can differ; f32 is the more
    faithful greedy decision).
    """
    K = qt.packed_rows or qt.q.shape[0]
    N = qt.q.shape[1]
    orig_shape = x.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    bn, bk = _pick_blocks(M, K, N, 1024, 512, qt.block_size,
                          budget=_tile_budget(qt.q.dtype))
    while N % bn:
        bn //= 2
    while K % bk or qt.block_size % bk:
        bk //= 2
    ok = (
        M <= 32
        and bn >= 128
        and bk >= 128
        and M * K * 2 <= _X_RESIDENT_BYTES
        and jnp.dtype(qt.q.dtype).itemsize == 1
        and not qt.packed_rows
        and vocab_size <= N
    )
    if not ok:
        return None

    n_k = K // bk
    n_n = N // bn
    out = pl.pallas_call(
        functools.partial(
            _rms_qmm_argmax_kernel, n_k=n_k, n_n=n_n, block_n=bn, block_k=bk,
            vocab=vocab_size, eps=eps, scale_fix=_w_scale_fixup(qt.q.dtype),
        ),
        out_shape=jax.ShapeDtypeStruct((M, 1), jnp.int32),
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((M, K), lambda ni, ki: (0, 0)),
            pl.BlockSpec((1, K), lambda ni, ki: (0, 0)),
            pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni)),
            pl.BlockSpec(
                (1, bn),
                lambda ni, ki, _bk=bk, _qb=qt.block_size: ((ki * _bk) // _qb, ni),
            ),
        ],
        out_specs=pl.BlockSpec((M, 1), lambda ni, ki: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((M, bn), jnp.float32),
            pltpu.VMEM((M, 1), jnp.float32),
            pltpu.VMEM((M, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # The argmax accumulates across N tiles: both axes sequential.
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N * qt.q.dtype.itemsize + M * 4,
            transcendentals=0,
        ),
        interpret=_interpret_default() if interpret is None else interpret,
    )(x2, gamma.reshape(1, K).astype(jnp.float32), qt.q, qt.scale)
    return out.reshape(*orig_shape[:-1], 1)


# ---------------------------------------------------------------------------
# quant_linear_residual: y = x @ dequant(W) + res
# ---------------------------------------------------------------------------

def _qmm_res_kernel(
    x_ref,  # [M, bk]
    w_ref,  # [bk, bn]
    s_ref,  # [1, bn]
    r_ref,  # [M, bn] residual tile
    o_ref,  # [M, bn]
    acc_ref,
    *,
    n_k: int,
    scale_fix: float = 1.0,
):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _load_w(w_ref[...])
    partial = jax.lax.dot(
        x_ref[...].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
    s = s_ref[0]
    if scale_fix != 1.0:
        s = s * scale_fix
    acc_ref[...] += partial * s[None, :]

    @pl.when(ki == n_k - 1)
    def _store():
        o_ref[...] = (acc_ref[...] + r_ref[...].astype(jnp.float32)).astype(
            o_ref.dtype
        )


def quant_linear_residual(
    x: jax.Array,
    qt: QTensor,
    res: jax.Array,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused x @ dequant(qt) + res for decode shapes (M <= 32)."""
    K = qt.packed_rows or qt.q.shape[0]
    N = qt.q.shape[1]
    orig_shape = res.shape
    x2 = x.reshape(-1, K)
    r2 = res.reshape(-1, N)
    M = x2.shape[0]

    bn, bk = _pick_blocks(M, K, N, 1024, 512, qt.block_size,
                          budget=_tile_budget(qt.q.dtype))
    while N % bn:
        bn //= 2
    while K % bk or qt.block_size % bk:
        bk //= 2
    ok = (
        M <= 32
        and bn >= 128
        and bk >= 128
        and jnp.dtype(qt.q.dtype).itemsize == 1
        and not qt.packed_rows
    )
    if not ok:
        from mila_tpu.kernels.quant_matmul import quant_linear

        out = quant_linear(x2, qt, interpret=interpret) + r2.astype(x2.dtype)
        return out.reshape(orig_shape)

    n_k = K // bk
    grid = (N // bn, n_k)
    out = pl.pallas_call(
        functools.partial(_qmm_res_kernel, n_k=n_k,
                          scale_fix=_w_scale_fixup(qt.q.dtype)),
        out_shape=jax.ShapeDtypeStruct((M, N), res.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, bk), lambda ni, ki: (0, ki)),
            pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni)),
            pl.BlockSpec(
                (1, bn),
                lambda ni, ki, _bk=bk, _qb=qt.block_size: ((ki * _bk) // _qb, ni),
            ),
            pl.BlockSpec((M, bn), lambda ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda ni, ki: (0, ni)),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N * qt.q.dtype.itemsize + 2 * M * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret_default() if interpret is None else interpret,
    )(x2, qt.q, qt.scale, r2)
    return out.reshape(orig_shape)


# ---------------------------------------------------------------------------
# rms_quant_linear_swiglu: h = silu(xn @ Wg) * (xn @ Wu), xn = rmsnorm(x)
# with W = [Wg | Wu] concatenated on the out axis (fuse_llama_projections).
# ---------------------------------------------------------------------------

def _rms_qmm_swiglu_kernel(
    x_ref,  # [M, K] resident
    g_ref,  # [1, K] gamma
    wg_ref,  # [bk, bn] gate tile
    wu_ref,  # [bk, bn] up tile
    sg_ref,  # [1, bn]
    su_ref,  # [1, bn]
    o_ref,  # [M, bn]
    accg_ref,
    accu_ref,
    *,
    n_k: int,
    block_k: int,
    eps: float,
    scale_fix: float = 1.0,
):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        accg_ref[...] = jnp.zeros_like(accg_ref)
        accu_ref[...] = jnp.zeros_like(accu_ref)

    rstd = _rstd(x_ref[...].astype(jnp.float32), eps)  # [M, 1]
    xt = x_ref[:, pl.ds(ki * block_k, block_k)].astype(jnp.float32)
    gt = g_ref[0, pl.ds(ki * block_k, block_k)]
    xb = (xt * rstd * gt[None, :]).astype(jnp.bfloat16)
    pg = jax.lax.dot(xb, _load_w(wg_ref[...]),
                     preferred_element_type=jnp.float32)
    pu = jax.lax.dot(xb, _load_w(wu_ref[...]),
                     preferred_element_type=jnp.float32)
    sg, su = sg_ref[0], su_ref[0]
    if scale_fix != 1.0:
        sg, su = sg * scale_fix, su * scale_fix
    accg_ref[...] += pg * sg[None, :]
    accu_ref[...] += pu * su[None, :]

    @pl.when(ki == n_k - 1)
    def _store():
        g = accg_ref[...]
        o_ref[...] = (g * jax.nn.sigmoid(g) * accu_ref[...]).astype(o_ref.dtype)


def rms_quant_linear_swiglu(
    x: jax.Array,
    gamma: jax.Array,
    qt: QTensor,
    *,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused ln_mlp -> [gate|up] projection -> SwiGLU for decode shapes.

    ``qt`` holds the fused [K, 2I] gate|up weight; returns [..., I].
    """
    K = qt.packed_rows or qt.q.shape[0]
    N2 = qt.q.shape[1]
    I = N2 // 2
    orig_shape = x.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    # Two weight tiles stream per grid step: halve the byte budget per tile.
    bn, bk = _pick_blocks(M, K, I, 1024, 512, qt.block_size,
                          budget=_tile_budget(qt.q.dtype))
    while I % bn or bn * bk > _DECODE_TILE_BYTES // 2:
        bn //= 2
    while K % bk or qt.block_size % bk:
        bk //= 2
    ok = (
        M <= 32
        and N2 % 2 == 0
        and bn >= 128
        and bk >= 128
        and M * K * 2 <= _X_RESIDENT_BYTES
        and jnp.dtype(qt.q.dtype).itemsize == 1
        and not qt.packed_rows
    )
    if not ok:
        from mila_tpu.kernels.quant_matmul import quant_linear
        from mila_tpu.ops.rmsnorm import rms_norm
        from mila_tpu.ops.swiglu import swiglu

        gu = quant_linear(rms_norm(x2, gamma, eps), qt, interpret=interpret)
        g, u = jnp.split(gu, 2, axis=-1)
        return swiglu(g, u).reshape(*orig_shape[:-1], I)

    n_k = K // bk
    n_i = I // bn
    grid = (n_i, n_k)
    out = pl.pallas_call(
        functools.partial(_rms_qmm_swiglu_kernel, n_k=n_k, block_k=bk, eps=eps,
                          scale_fix=_w_scale_fixup(qt.q.dtype)),
        out_shape=jax.ShapeDtypeStruct((M, I), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda ni, ki: (0, 0)),
            pl.BlockSpec((1, K), lambda ni, ki: (0, 0)),
            pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni)),
            pl.BlockSpec((bk, bn), lambda ni, ki, _ni=n_i: (ki, ni + _ni)),
            pl.BlockSpec(
                (1, bn),
                lambda ni, ki, _bk=bk, _qb=qt.block_size: ((ki * _bk) // _qb, ni),
            ),
            pl.BlockSpec(
                (1, bn),
                lambda ni, ki, _bk=bk, _qb=qt.block_size, _ni=n_i: (
                    (ki * _bk) // _qb,
                    ni + _ni,
                ),
            ),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda ni, ki: (0, ni)),
        scratch_shapes=[
            pltpu.VMEM((M, bn), jnp.float32),
            pltpu.VMEM((M, bn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N2 * K,
            bytes_accessed=M * K * 2 + K * N2 * qt.q.dtype.itemsize + M * I * 2,
            transcendentals=M * I,
        ),
        interpret=_interpret_default() if interpret is None else interpret,
    )(x2, gamma.reshape(1, K).astype(jnp.float32), qt.q, qt.q, qt.scale, qt.scale)
    return out.reshape(*orig_shape[:-1], I)
