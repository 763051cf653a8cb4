"""Pallas weight-only dequant+matmul kernel with bias/activation epilogue.

The BASELINE flagship kernel: replaces the reference's cuBLASLt Linear
forward plans (CudaLinearOp.ixx build_forward_plan:147-225 — matmul with
CUBLASLT_EPILOGUE_BIAS) with a tiled MXU kernel that dequantizes INT8/FP8
weight tiles in VMEM (int8→bf16 is exact), accumulates in f32 across K
tiles in VMEM scratch, and fuses the bias (+ optional GELU — the
CudaLinearGeluOp epilogue analogue) on the last K step.

Performance notes: the kernel is HBM-bound on the int8 weight stream at
inference batch sizes, which is exactly why weight-only quantization wins —
the weight bytes halve (vs bf16) while the MXU still runs bf16 matmuls.
Scale handling requires the quantization block size to be a multiple of the
K tile so each tile sees a single scale row.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mila_tpu.inference.quantize import QTensor, quant_linear_ref


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def _qmm_kernel(
    x_ref,  # [bm, bk] activations
    w_ref,  # [bk, bn] quantized weights
    s_ref,  # [1, bn] scale row for this K tile
    b_ref,  # [1, bn] bias (or None)
    o_ref,  # [bm, bn]
    acc_ref,  # VMEM [bm, bn] f32
    *,
    n_k: int,
    activation: Optional[str],
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = w_ref[...].astype(jnp.bfloat16)  # int8 → bf16 exact
    partial = jax.lax.dot(
        x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
    acc_ref[...] += partial * s_ref[0][None, :]

    @pl.when(ki == n_k - 1)
    def _store():
        out = acc_ref[...]
        if b_ref is not None:
            out = out + b_ref[0][None, :]
        if activation == "gelu":
            out = jax.nn.gelu(out, approximate=True)
        elif activation == "silu":
            out = out * jax.nn.sigmoid(out)
        o_ref[...] = out.astype(o_ref.dtype)


def _quant_matmul_2d(
    x: jax.Array,  # [M, K]
    qt: QTensor,  # q [K, N], scale [K//bs, N]
    bias: Optional[jax.Array],
    activation: Optional[str],
    block_m: int,
    block_n: int,
    block_k: int,
    interpret: Optional[bool],
) -> jax.Array:
    M, K = x.shape
    _, N = qt.q.shape
    n_k = K // block_k

    grid = (M // block_m, N // block_n, n_k)
    qblock = qt.block_size

    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda mi, ni, ki: (mi, ki)),
        pl.BlockSpec((block_k, block_n), lambda mi, ni, ki: (ki, ni)),
        # one scale row per K tile (qblock % block_k == 0 guaranteed by caller)
        pl.BlockSpec(
            (1, block_n),
            lambda mi, ni, ki, _bk=block_k, _qb=qblock: ((ki * _bk) // _qb, ni),
        ),
    ]
    args = [x, qt.q, qt.scale]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, block_n), lambda mi, ni, ki: (0, ni)))
        args.append(bias.reshape(1, N).astype(jnp.float32))
        kernel = functools.partial(_qmm_kernel, n_k=n_k, activation=activation)
    else:
        kernel = functools.partial(
            lambda x_ref, w_ref, s_ref, o_ref, acc_ref, **kw: _qmm_kernel(
                x_ref, w_ref, s_ref, None, o_ref, acc_ref, **kw
            ),
            n_k=n_k,
            activation=activation,
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni, ki: (mi, ni)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N * qt.q.dtype.itemsize + M * N * 2,
            transcendentals=M * N if activation else 0,
        ),
        interpret=_interpret_default() if interpret is None else interpret,
    )(*args)


# Profile-guided block table for HBM-bound decode shapes (M <= 32): best
# (block_n, block_k) per (K, N), measured on the v5e chip with
# `python benchmarks/decode_profile.py --what sweep` (weight-stream GB/s).
# Missing shapes fall through to the tile-size heuristic below.
_DECODE_BLOCKS: dict[tuple[int, int], tuple[int, int]] = {}

# Weight-tile byte budget: ~4MB double-buffers to 8MB, comfortably inside the
# ~16MB VMEM/core with the x/acc/out blocks.
_DECODE_TILE_BYTES = 4 * 1024 * 1024


def _pick_blocks(M: int, K: int, N: int, block_n: int, block_k: int,
                 qblock: int):
    """Decode shapes (M <= 32) are pure weight-stream: pick the largest
    (bn, bk) tile dividing (N, K) under the VMEM budget so the HBM DMAs are
    few and large. Prefill/training shapes keep the caller's MXU-tuned blocks.

    ``qblock`` (the quantization block size) caps bk: every K tile must see a
    single scale row, so bk must divide qblock as well as K.
    """
    if M > 32:
        return block_n, block_k
    hit = _DECODE_BLOCKS.get((K, N))
    if hit is not None and hit[1] <= qblock and qblock % hit[1] == 0:
        return hit
    bk = min(2048, qblock)
    while bk >= 128 and (K % bk or qblock % bk):
        bk //= 2
    if bk < 128:
        return block_n, block_k
    for bn in (4096, 3072, 2048, 1536, 1024, 512, 256):
        if N % bn == 0 and bn * bk <= _DECODE_TILE_BYTES:
            return bn, bk
    return block_n, block_k


def quant_linear(
    x: jax.Array,
    qt: QTensor,
    bias: Optional[jax.Array] = None,
    *,
    activation: Optional[str] = None,
    # Defaults from the v5e block sweep (benchmarks/kernel_bench.py):
    # (256, 1024, 512) ⇒ 246 TFLOP/s, 1.7x XLA dequant matmul. Passing
    # explicit block_n/block_k disables the decode-shape auto-pick.
    block_m: int = 256,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Weight-only quantized linear: x [..., K] @ dequant(qt) [K, N] (+bias).

    Drop-in quantized replacement for :func:`mila_tpu.ops.linear`. Falls back
    to the jnp reference for shapes that don't tile.
    """
    K, N = qt.q.shape
    orig_shape = x.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    explicit = block_n is not None or block_k is not None
    block_n = 1024 if block_n is None else block_n
    block_k = 512 if block_k is None else block_k
    if not explicit:
        block_n, block_k = _pick_blocks(M, K, N, block_n, block_k,
                                        qt.block_size)
    bm = min(block_m, M)
    bn = min(block_n, N)
    bk = min(block_k, K)
    while M % bm:
        bm //= 2
    while N % bn:
        bn //= 2
    while K % bk:
        bk //= 2
    tiles_ok = (
        bm >= 8
        and bn >= 128
        and bk >= 128
        and qt.block_size % bk == 0
        and jnp.dtype(qt.q.dtype).itemsize == 1  # int8/fp8 paths
    )
    if not tiles_ok:
        out = quant_linear_ref(x2, qt, bias)
        if activation == "gelu":
            out = jax.nn.gelu(out, approximate=True)
        elif activation == "silu":
            out = out * jax.nn.sigmoid(out)
        return out.reshape(*orig_shape[:-1], N)

    out = _quant_matmul_2d(x2, qt, bias, activation, bm, bn, bk, interpret)
    return out.reshape(*orig_shape[:-1], N)
