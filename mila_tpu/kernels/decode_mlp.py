"""Whole-MLP decode megakernel: wo(+residual) -> RMSNorm -> gate|up ->
SwiGLU -> down(+residual) as ONE Pallas weight stream.

Why: at decode batch sizes every matmul is HBM-bound on its weight bytes,
and the r3 on-chip experiments (benchmarks/r3_experiments.py) showed the
per-matmul kernels lose to FIXED overhead, not compute: a 4MB matrix (wo)
streams at ~520-600 GB/s even with the compute removed, while a 33MB matrix
(wgu) hits 768 GB/s with full dequant+matmul — the pipeline prologue/drain
and kernel launch are amortized over too few tiles. Fusing the three MLP
matmuls (wo 4MB + wgu 33MB + down 17MB for Llama-1B) into one pallas_call
streams 54.6MB without ever stopping the DMA pipeline, and the RMSNorm /
SwiGLU / residual adds ride along in registers exactly like the fused
epilogues in kernels/decode_fused.py.

Parity anchor: the reference builds one cuBLASLt plan per Linear with fused
epilogues (CudaLinearOp.ixx build_forward_plan:147-225); this goes further
the TPU way — one kernel per MLP block, because on TPU the launch+prologue
gap between back-to-back HBM-bound kernels is the dominant loss.

Weight layout (``pack_mlp``): all three weights are cut into uniform
[bk, bn] tiles (bk = hidden, bn = 2048 by default) and stacked into a
single [T, bk, bn] buffer in STREAM ORDER:

    [wo n-tiles] [g_0 u_0 g_1 u_1 ...] [down (k0,n0) (k0,n1) (k1,n0) ...]

gate/up tiles interleave so each SwiGLU h-chunk finalizes as soon as its up
tile lands; h chunk k is complete before the down k-tiles that read it.
A matching [T, bn] scale buffer carries one f32 scale row per tile (the fp8
bit-decode fixup of kernels/quant_matmul.py is folded in at pack time).

Inference-only (no VJP): runs inside the jitted decode step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mila_tpu.inference.quantize import QTensor, quant_linear_ref
from mila_tpu.kernels.quant_matmul import _load_w, _w_scale_fixup


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


class MLPPack(NamedTuple):
    """Tiled-and-stacked MLP weights for the megakernel (see module doc)."""

    w: jax.Array  # [T, bk, bn] int8 / fp8
    s: jax.Array  # [T, 1, bn] f32, fp8 fixup folded (middle singleton:
    #   Pallas block dims must divide or equal the array dims)
    h_dim: int  # hidden size H (= bk)
    i_dim: int  # intermediate size I
    bn: int
    n_wo: int  # H // bn
    n_gu: int  # 2 * I // bn
    n_down: int  # (I // bk) * (H // bn)


# The int fields are shape-static (they parameterize the kernel): keep them
# in pytree aux data so jit doesn't trace them (same pattern as QTensor).
jax.tree_util.register_pytree_node(
    MLPPack,
    lambda t: ((t.w, t.s), tuple(t[2:])),
    lambda aux, leaves: MLPPack(leaves[0], leaves[1], *aux),
)


def pack_mlp(
    wo: QTensor, wgu: QTensor, down: QTensor, *, bn: int = 2048
) -> Optional[MLPPack]:
    """Stack wo/wgu/down into the megakernel stream layout.

    Returns None when the shapes don't fit the layout (callers fall back to
    the per-matmul fused kernels): requires wo [H, H], wgu [H, 2I],
    down [I, H] with bn | H, bn | I, H | I, and every quantization block
    covering a whole [bk=H] tile row range. int4-packed tensors unsupported.
    """
    if any(q.packed_rows for q in (wo, wgu, down)):
        return None
    H, H2 = wo.q.shape
    Hg, I2 = wgu.q.shape
    I, Hd = down.q.shape
    if H != H2 or H != Hg or Hd != H or I2 != 2 * I:
        return None
    bn = min(bn, H)
    if H % bn or I % bn or I % H:
        return None
    dt = wo.q.dtype
    if wgu.q.dtype != dt or down.q.dtype != dt or jnp.dtype(dt).itemsize != 1:
        return None
    bk = H
    # Every tile must see a single scale row: block_size multiple of bk.
    for q in (wo, wgu):
        if q.block_size % bk:
            return None
    if down.block_size % bk:
        return None

    fix = _w_scale_fixup(dt)

    def srow(qt: QTensor, k0: int, n0: int) -> jax.Array:
        return qt.scale[k0 // qt.block_size, n0 : n0 + bn] * fix

    tiles, scales = [], []
    # wo [H, H]
    for n in range(H // bn):
        tiles.append(wo.q[:, n * bn : (n + 1) * bn])
        scales.append(srow(wo, 0, n * bn))
    # wgu [H, 2I]: interleave gate/up so h finalizes chunk-by-chunk
    for j in range(I // bn):
        tiles.append(wgu.q[:, j * bn : (j + 1) * bn])
        scales.append(srow(wgu, 0, j * bn))
        tiles.append(wgu.q[:, I + j * bn : I + (j + 1) * bn])
        scales.append(srow(wgu, 0, I + j * bn))
    # down [I, H], k-major
    for k in range(I // bk):
        for n in range(H // bn):
            tiles.append(down.q[k * bk : (k + 1) * bk, n * bn : (n + 1) * bn])
            scales.append(srow(down, k * bk, n * bn))

    w = jnp.stack(tiles)
    s = jnp.stack([x.astype(jnp.float32) for x in scales])[:, None, :]
    return MLPPack(
        w=w, s=s, h_dim=H, i_dim=I, bn=bn,
        n_wo=H // bn, n_gu=2 * I // bn, n_down=(I // bk) * (H // bn),
    )


def _mlp_mega_kernel(
    att_ref,  # [M, H] attention output (wo input)
    x_ref,  # [M, H] pre-attention residual stream
    gm_ref,  # [1, H] f32 ln_mlp gamma
    w_ref,  # [1, bk, bn] weight tile
    s_ref,  # [1, 1, bn] scale row
    o_ref,  # [M, H]
    x1_ref,  # VMEM [M, H] f32: post-attention residual
    xn_ref,  # VMEM [M, H] bf16: rmsnorm(x1) * gamma
    g_ref,  # VMEM [M, bn] f32: pending gate tile
    h_ref,  # VMEM [M, I] bf16: swiglu output
    acc_ref,  # VMEM [M, H] f32: down accumulator
    *,
    n_wo: int,
    n_gu: int,
    n_down: int,
    bn: int,
    H: int,
    I: int,
    eps: float,
):
    i = pl.program_id(0)
    w = _load_w(w_ref[0])  # [bk, bn] bf16 (int8 cast / fp8 bit-decode)
    s = s_ref[0, 0]  # [bn] f32

    @pl.when(i < n_wo)
    def _wo():
        p = jax.lax.dot(
            att_ref[...].astype(jnp.bfloat16), w,
            preferred_element_type=jnp.float32,
        )
        col = i * bn
        x1_ref[:, pl.ds(col, bn)] = (
            p * s[None, :] + x_ref[:, pl.ds(col, bn)].astype(jnp.float32)
        )

    @pl.when(i == n_wo)
    def _xn():
        x1 = x1_ref[...]
        rstd = jax.lax.rsqrt(
            jnp.mean(jnp.square(x1), axis=-1, keepdims=True) + eps
        )
        xn_ref[...] = (x1 * rstd * gm_ref[0][None, :]).astype(jnp.bfloat16)

    jg = i - n_wo

    @pl.when((i >= n_wo) & (i < n_wo + n_gu))
    def _gu():
        p = (
            jax.lax.dot(xn_ref[...], w, preferred_element_type=jnp.float32)
            * s[None, :]
        )

        @pl.when(jg % 2 == 0)
        def _gate():
            g_ref[...] = p

        @pl.when(jg % 2 == 1)
        def _up():
            g = g_ref[...]
            h_ref[:, pl.ds((jg // 2) * bn, bn)] = (
                g * jax.nn.sigmoid(g) * p
            ).astype(jnp.bfloat16)

    jd = i - n_wo - n_gu
    n_cols = H // bn

    @pl.when(i >= n_wo + n_gu)
    def _down():
        @pl.when(jd == 0)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        k = jd // n_cols
        n = jd % n_cols
        xk = h_ref[:, pl.ds(k * H, H)]  # bk == H
        p = jax.lax.dot(xk, w, preferred_element_type=jnp.float32)
        col = n * bn
        acc_ref[:, pl.ds(col, bn)] += p * s[None, :]

        @pl.when(jd == n_down - 1)
        def _store():
            o_ref[...] = (acc_ref[...] + x1_ref[...]).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# Manual-DMA variant: grid=(), the tile loop fully unrolled in Python with an
# explicit depth-3 copy ring. The grid version above (kept as the interpret/
# CPU path) measured 591 GB/s on v5e — the pl.when phase branches and
# dynamic-offset scratch stores defeat Mosaic's pipeline — while the pure
# manual ring streams at ~755 GB/s (benchmarks/r3_stream.py). Unrolling makes
# every offset static and every phase straight-line code; intermediates are
# SSA values, not scratch refs.
# ---------------------------------------------------------------------------

def _mlp_manual_kernel(
    att_ref,  # [M, H] VMEM
    x_ref,  # [M, H] VMEM
    gm_ref,  # [1, H] f32 VMEM
    s_ref,  # [T, 1, bn] f32 VMEM (resident: ~4KB/tile)
    w_hbm,  # [T, bk, bn] ANY
    o_ref,  # [M, H] VMEM
    *,
    n_wo: int,
    n_gu: int,
    n_down: int,
    bn: int,
    H: int,
    eps: float,
    depth: int,
):
    n_tiles = n_wo + n_gu + n_down
    n_cols = H // bn
    cpb = H // bn  # h chunks (bn wide) per down K tile (bk == H)

    def body(wbuf, wsem):
        def copy(slot, t):
            return pltpu.make_async_copy(w_hbm.at[t], wbuf.at[slot],
                                         wsem.at[slot])

        for d in range(min(depth, n_tiles)):
            copy(d, d).start()

        att = att_ref[...].astype(jnp.bfloat16)
        gm = gm_ref[0]
        x1_chunks, h_chunks = [], []
        x1 = xn = g_val = None
        acc = [None] * n_cols

        for t in range(n_tiles):
            slot = t % depth
            copy(slot, t).wait()
            w = _load_w(wbuf[slot])
            s = s_ref[t, 0]
            if t < n_wo:
                p = jax.lax.dot(att, w, preferred_element_type=jnp.float32)
                x1_chunks.append(
                    p * s[None, :]
                    + x_ref[:, t * bn : (t + 1) * bn].astype(jnp.float32)
                )
                if t == n_wo - 1:
                    x1 = (x1_chunks[0] if n_wo == 1
                          else jnp.concatenate(x1_chunks, axis=1))
                    rstd = jax.lax.rsqrt(
                        jnp.mean(jnp.square(x1), axis=-1, keepdims=True) + eps
                    )
                    xn = (x1 * rstd * gm[None, :]).astype(jnp.bfloat16)
            elif t < n_wo + n_gu:
                j = t - n_wo
                p = (jax.lax.dot(xn, w, preferred_element_type=jnp.float32)
                     * s[None, :])
                if j % 2 == 0:
                    g_val = p
                else:
                    h_chunks.append(
                        (g_val * jax.nn.sigmoid(g_val) * p).astype(jnp.bfloat16)
                    )
            else:
                jd = t - n_wo - n_gu
                k, n = divmod(jd, n_cols)
                hk = h_chunks[k * cpb : (k + 1) * cpb]
                xk = hk[0] if cpb == 1 else jnp.concatenate(hk, axis=1)
                p = (jax.lax.dot(xk, w, preferred_element_type=jnp.float32)
                     * s[None, :])
                acc[n] = p if acc[n] is None else acc[n] + p
            if t + depth < n_tiles:
                copy(slot, t + depth).start()

        out = acc[0] if n_cols == 1 else jnp.concatenate(acc, axis=1)
        o_ref[...] = (out + x1).astype(o_ref.dtype)

    pl.run_scoped(
        body,
        wbuf=pltpu.VMEM((depth, w_hbm.shape[1], bn), w_hbm.dtype),
        wsem=pltpu.SemaphoreType.DMA((depth,)),
    )


def mlp_block_fused(
    att: jax.Array,
    x: jax.Array,
    gamma: jax.Array,
    pack: MLPPack,
    *,
    eps: float = 1e-5,
    depth: int = 3,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x1 = att @ wo + x; h = swiglu(rmsnorm(x1, gamma) @ wgu);
    return h @ down + x1 — one Pallas call, one uninterrupted weight stream.

    att, x: [..., H] with prod(leading) <= 32 (decode shapes).
    """
    H, I, bn = pack.h_dim, pack.i_dim, pack.bn
    orig_shape = x.shape
    a2 = att.reshape(-1, H)
    x2 = x.reshape(-1, H)
    M = x2.shape[0]
    if M > 32:
        raise ValueError(f"mlp_block_fused is decode-only (M={M} > 32)")

    n_tiles = pack.n_wo + pack.n_gu + pack.n_down
    # Ring buffer budget ~9MB of the ~16MB VMEM (activations/accs take <1MB).
    tile_bytes = H * bn * pack.w.dtype.itemsize
    depth = max(2, min(depth, (9 * 1024 * 1024) // tile_bytes))
    interp = _interpret_default() if interpret is None else interpret
    if interp:
        # Interpret mode can't run the manual DMA ring; the grid version is
        # the CPU-testable equivalent (same math, same tile order).
        out = pl.pallas_call(
            functools.partial(
                _mlp_mega_kernel,
                n_wo=pack.n_wo, n_gu=pack.n_gu, n_down=pack.n_down,
                bn=bn, H=H, I=I, eps=eps,
            ),
            out_shape=jax.ShapeDtypeStruct((M, H), x.dtype),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((M, H), lambda i: (0, 0)),
                pl.BlockSpec((M, H), lambda i: (0, 0)),
                pl.BlockSpec((1, H), lambda i: (0, 0)),
                pl.BlockSpec((1, H, bn), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 1, bn), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((M, H), lambda i: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((M, H), jnp.float32),
                pltpu.VMEM((M, H), jnp.bfloat16),
                pltpu.VMEM((M, bn), jnp.float32),
                pltpu.VMEM((M, I), jnp.bfloat16),
                pltpu.VMEM((M, H), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=True,
        )(a2, x2, gamma.reshape(1, H).astype(jnp.float32), pack.w, pack.s)
        return out.reshape(orig_shape)

    out = pl.pallas_call(
        functools.partial(
            _mlp_manual_kernel,
            n_wo=pack.n_wo, n_gu=pack.n_gu, n_down=pack.n_down,
            bn=bn, H=H, eps=eps, depth=depth,
        ),
        out_shape=jax.ShapeDtypeStruct((M, H), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (H * H + 2 * H * I + I * H),
            bytes_accessed=n_tiles * H * bn * pack.w.dtype.itemsize
            + 4 * M * H * 2,
            transcendentals=M * I,
        ),
        interpret=False,
    )(
        a2, x2, gamma.reshape(1, H).astype(jnp.float32), pack.s, pack.w
    )
    return out.reshape(orig_shape)


def mlp_block_ref(
    att: jax.Array,
    x: jax.Array,
    gamma: jax.Array,
    wo: QTensor,
    wgu: QTensor,
    down: QTensor,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    """jnp oracle for :func:`mlp_block_fused` (same math, unfused)."""
    from mila_tpu.ops.rmsnorm import rms_norm
    from mila_tpu.ops.swiglu import swiglu

    H = x.shape[-1]
    x1 = quant_linear_ref(att.reshape(-1, H), wo).astype(jnp.float32) + x.reshape(
        -1, H
    ).astype(jnp.float32)
    x1 = x1.astype(x.dtype)
    gu = quant_linear_ref(rms_norm(x1, gamma, eps), wgu)
    g, u = jnp.split(gu, 2, axis=-1)
    out = quant_linear_ref(swiglu(g, u), down).astype(jnp.float32) + x1.astype(
        jnp.float32
    )
    return out.astype(x.dtype).reshape(x.shape)
