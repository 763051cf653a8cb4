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


# FP8 weight tiles: Mosaic lowers the native fp8->bf16 cast through f32-wide
# VMEM intermediates (measured ~6x slower end-to-end on v5e, and >2MB tiles
# fail to compile outright). Instead decode the bits on the VPU with i32
# integer ops (i16 vector shifts don't legalize on Mosaic): shift the 7-bit
# payload into the f32 exponent/mantissa fields, bitcast, and narrow to bf16.
# The decoded value is the fp8 value times 2^(bias_fp8 - 127); the caller
# folds the constant 2^(127 - bias) back in via the (already per-tile) scale
# row. Exact for normals (the fp8 mantissa fits bf16's 8 bits); fp8
# subnormals land below the f32/bf16 normal range and flush to zero — max abs
# error 7*2^-9 on the e4m3 lattice, ~3e-5 of absmax, far below quantization
# error. e4m3fn NaN (absent from absmax-clipped weights) decodes to a large
# normal.
#   e4m3fn: [s eeee mmm]  mantissa 3, bias 7   -> scale * 2^120
#   e5m2:   [s eeeee mm]  mantissa 2, bias 15  -> scale * 2^112
_FP8_SPECS = {
    jnp.dtype(jnp.float8_e4m3fn): (3, 2.0**120),
    jnp.dtype(jnp.float8_e5m2): (2, 2.0**112),
}


def _w_scale_fixup(qdtype) -> float:
    """Constant to fold into the scale row when _load_w bit-decodes fp8."""
    spec = _FP8_SPECS.get(jnp.dtype(qdtype))
    return spec[1] if spec is not None else 1.0


def _load_w(w: jax.Array) -> jax.Array:
    """Weight tile -> bf16 for the MXU; fp8 via the bit-shift decode above
    (value scaled by 2^-(127-bias), compensated in the scale row)."""
    spec = _FP8_SPECS.get(jnp.dtype(w.dtype))
    if spec is None:
        return w.astype(jnp.bfloat16)  # int8 -> bf16 exact, native fast path
    mbits, _ = spec
    b = jax.lax.bitcast_convert_type(w, jnp.int8).astype(jnp.int32)
    # Payload into f32 exponent/mantissa (shift 23 - mbits), sign bit 7 -> 31
    # (<<24 wraps into the sign bit; shifts are bitwise).
    bits = ((b & 0x7F) << (23 - mbits)) | ((b & 0x80) << 24)
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)


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
    scale_fix: float = 1.0,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = _load_w(w_ref[...])  # int8 exact; fp8 bit-decoded (scale_fix folds in)
    partial = jax.lax.dot(
        x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
    s = s_ref[0]
    if scale_fix != 1.0:
        s = s * scale_fix
    acc_ref[...] += partial * s[None, :]

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
    fix = _w_scale_fixup(qt.q.dtype)
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, block_n), lambda mi, ni, ki: (0, ni)))
        args.append(bias.reshape(1, N).astype(jnp.float32))
        kernel = functools.partial(
            _qmm_kernel, n_k=n_k, activation=activation, scale_fix=fix
        )
    else:
        kernel = functools.partial(
            lambda x_ref, w_ref, s_ref, o_ref, acc_ref, **kw: _qmm_kernel(
                x_ref, w_ref, s_ref, None, o_ref, acc_ref, **kw
            ),
            n_k=n_k,
            activation=activation,
            scale_fix=fix,
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
_DECODE_BLOCKS: dict[tuple[int, int], tuple[int, int]] = {
    # (K, N): (block_n, block_k) — v5e M=8 sweep 2026-08-19
    # (benchmarks/decode_sweep.py; best GB/s per Llama-1B decode shape)
    (2048, 3072): (1024, 2048),   # wqkv   602 GB/s
    (2048, 2048): (1024, 1024),   # wo     568 GB/s
    (2048, 16384): (1024, 2048),  # wgu    729 GB/s
    (2048, 8192): (1024, 2048),   # wgu swiglu-paired half
    (8192, 2048): (1024, 2048),   # down   669 GB/s
    (2048, 129024): (1536, 2048), # lm_head 743 GB/s
}

# Weight-tile byte budget: ~4MB double-buffers to 8MB, comfortably inside the
# ~16MB VMEM/core with the x/acc/out blocks.
_DECODE_TILE_BYTES = 4 * 1024 * 1024


def _pick_blocks(M: int, K: int, N: int, block_n: int, block_k: int,
                 qblock: int, budget: int = _DECODE_TILE_BYTES):
    """Decode shapes (M <= 32) are pure weight-stream: pick the largest
    (bn, bk) tile dividing (N, K) under the VMEM budget so the HBM DMAs are
    few and large. Prefill/training shapes keep the caller's MXU-tuned blocks.

    ``qblock`` (the quantization block size) caps bk: every K tile must see a
    single scale row, so bk must divide qblock as well as K. ``budget`` caps
    bn*bk weight-tile bytes; all 1-byte dtypes (int8 and bit-decoded fp8)
    stream with the same full budget — see :func:`_tile_budget`.
    """
    if M > 32:
        return block_n, block_k
    hit = _DECODE_BLOCKS.get((K, N))
    if hit is not None and hit[1] <= qblock and qblock % hit[1] == 0:
        bn, bk = hit
        while bn > 128 and bn * bk > budget:
            bn //= 2
        if N % bn == 0 and bn * bk <= budget:
            return bn, bk
    bk = min(2048, qblock)
    while bk >= 128 and (K % bk or qblock % bk):
        bk //= 2
    if bk < 128:
        return block_n, block_k
    for bn in (4096, 3072, 2048, 1536, 1024, 512, 256):
        if N % bn == 0 and bn * bk <= budget:
            return bn, bk
    return block_n, block_k


def _tile_budget(qdtype) -> int:
    """Per-tile weight byte budget. fp8 tiles used to be quartered because the
    native Mosaic fp8->bf16 cast widened through ~10x f32 VMEM intermediates;
    the integer bit-decode in :func:`_load_w` removed that, so every 1-byte
    dtype now streams with the full int8-sized budget."""
    del qdtype
    return _DECODE_TILE_BYTES


# ---------------------------------------------------------------------------
# Packed INT4: two signed nibbles per byte, split-halves layout (pack_int4).
# One packed tile unpacks into two K-tiles; the resident activations are
# sliced at both ranges. Decode shapes only (M <= 32) — prefill unpacks to
# the int8 path.
# ---------------------------------------------------------------------------

def _qmm4_kernel(
    x_ref,  # [M, K] resident activations
    wp_ref,  # [bkp, bn] packed int8 (2 nibbles)
    sl_ref,  # [1, bn] scale row for the low-half K tile
    sh_ref,  # [1, bn] scale row for the high-half K tile
    o_ref,  # [M, bn]
    acc_ref,
    *,
    n_k: int,
    block_kp: int,
    half: int,
):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    b = wp_ref[...].astype(jnp.int32)
    w_lo = ((b << 28) >> 28).astype(jnp.bfloat16)  # sign-extended low nibble
    w_hi = ((b << 24) >> 28).astype(jnp.bfloat16)
    x_lo = x_ref[:, pl.ds(ki * block_kp, block_kp)].astype(jnp.bfloat16)
    x_hi = x_ref[:, pl.ds(half + ki * block_kp, block_kp)].astype(jnp.bfloat16)
    p_lo = jax.lax.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
    p_hi = jax.lax.dot(x_hi, w_hi, preferred_element_type=jnp.float32)
    acc_ref[...] += p_lo * sl_ref[0][None, :] + p_hi * sh_ref[0][None, :]

    @pl.when(ki == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _quant_matmul4_2d(x, qt, block_n, block_kp, interpret):
    M, K = x.shape
    Kp, N = qt.q.shape
    half = K // 2
    n_k = Kp // block_kp
    qb = qt.block_size

    def s_lo(ni, ki, _bk=block_kp, _qb=qb):
        return ((ki * _bk) // _qb, ni)

    def s_hi(ni, ki, _bk=block_kp, _qb=qb, _half=half):
        return ((_half + ki * _bk) // _qb, ni)

    return pl.pallas_call(
        functools.partial(_qmm4_kernel, n_k=n_k, block_kp=block_kp, half=half),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(N // block_n, n_k),
        in_specs=[
            pl.BlockSpec((M, K), lambda ni, ki: (0, 0)),
            pl.BlockSpec((block_kp, block_n), lambda ni, ki: (ki, ni)),
            pl.BlockSpec((1, block_n), s_lo),
            pl.BlockSpec((1, block_n), s_hi),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda ni, ki: (0, ni)),
        scratch_shapes=[pltpu.VMEM((M, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + Kp * N + M * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret_default() if interpret is None else interpret,
    )(x, qt.q, qt.scale, qt.scale)


def _quant_linear_int4(x2, qt, bias, activation, interpret):
    """Dispatch for packed-int4 QTensors ([M, K] x already flattened)."""
    from mila_tpu.inference.quantize import unpack_int4

    M, K = x2.shape
    Kp, N = qt.q.shape
    half = K // 2
    qb = qt.block_size
    bkp = min(2048, Kp)
    while bkp >= 128 and (Kp % bkp or qb % bkp):
        bkp //= 2
    bn = 1024
    for cand in (4096, 3072, 2048, 1536, 1024, 512, 256):
        if N % cand == 0 and cand * bkp <= _DECODE_TILE_BYTES:
            bn = cand
            break
    # qb % bkp == 0 (enforced above) keeps every bkp-aligned K window inside
    # one scale block for both nibble halves.
    ok = (
        M <= 32
        and bkp >= 128
        and N % bn == 0
        and bn >= 128
        and M * K * 2 <= 1024 * 1024
    )
    if not ok:
        # Prefill / odd shapes: unpack to int8 once and take the int8 path.
        return quant_linear(
            x2, unpack_int4(qt), bias, activation=activation,
            interpret=interpret,
        )
    out = _quant_matmul4_2d(x2, qt, bn, bkp, interpret)
    if bias is not None:
        out = (out.astype(jnp.float32) + bias.astype(jnp.float32)).astype(out.dtype)
    if activation == "gelu":
        out = jax.nn.gelu(out, approximate=True)
    elif activation == "silu":
        out = out * jax.nn.sigmoid(out)
    return out


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
    if qt.packed_rows:
        K = qt.packed_rows
        orig_shape = x.shape
        out = _quant_linear_int4(
            x.reshape(-1, K), qt, bias, activation, interpret
        )
        return out.reshape(*orig_shape[:-1], qt.q.shape[1])

    K, N = qt.q.shape
    orig_shape = x.shape
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    explicit = block_n is not None or block_k is not None
    block_n = 1024 if block_n is None else block_n
    block_k = 512 if block_k is None else block_k
    if not explicit:
        block_n, block_k = _pick_blocks(M, K, N, block_n, block_k,
                                        qt.block_size,
                                        budget=_tile_budget(qt.q.dtype))
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
