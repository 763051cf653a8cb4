"""Layer-tail decode megakernel: wo(+res) -> RMSNorm -> SwiGLU MLP(+res) ->
NEXT layer's RMSNorm+wqkv as ONE manual-DMA Pallas weight stream.

kernels/decode_mlp.py fused the three MLP matmuls into one stream (716-733
GB/s on v5e vs 568-669 for the separate kernels). This kernel appends the
NEXT layer's rms+wqkv product to the same stream, so a decode layer is
exactly two kernels — [dense attention] -> [this] — and the 6.3MB wqkv
matrix stops paying its own launch + pipeline prologue (it streamed at
602 GB/s as a standalone kernel).

The attention kernel stays separate by design: Mosaic cannot reshape a
[B, NH, HD] vector to [B, NH*HD] in-kernel ("unsupported shape cast", r3
probe), so attention's per-head output crosses through HBM where the
reshape is free, costing one tiny [B, H] round-trip instead of an
unsupported relayout.

Weight layout (``pack_layer``): uniform [bk=H, bn] tiles stacked in STREAM
ORDER [wo | g0 u0 g1 u1 ... | down k-major | wqkv_next], with a matching
[T, 1, bn] f32 scale buffer (fp8 bit-decode fixup folded at pack time).

Parity anchor: the reference caches one cuBLASLt plan per Linear with fused
epilogues (CudaLinearOp.ixx build_forward_plan:147-225); on TPU the
launch+prologue gap between back-to-back HBM-bound kernels is the dominant
loss, so the TPU-native answer is one weight stream per layer tail.

Inference-only (no VJP): runs inside the jitted decode step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mila_tpu.inference.quantize import QTensor
from mila_tpu.kernels.quant_matmul import _load_w, _w_scale_fixup


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


class LayerPack(NamedTuple):
    """Tiled-and-stacked layer-tail weights (see module doc)."""

    w: jax.Array  # [T, bk, bn] int8 / fp8
    s: jax.Array  # [T, 1, bn] f32 (fp8 fixup folded)
    h_dim: int
    i_dim: int
    bn: int
    n_wo: int
    n_gu: int
    n_down: int
    n_qkv: int  # 0 on the last layer


jax.tree_util.register_pytree_node(
    LayerPack,
    lambda t: ((t.w, t.s), tuple(t[2:])),
    lambda aux, leaves: LayerPack(leaves[0], leaves[1], *aux),
)


def pack_layer(
    wo: QTensor,
    wgu: QTensor,
    down: QTensor,
    wqkv_next: Optional[QTensor],
    *,
    bn: int = 512,
) -> Optional[LayerPack]:
    """Stack wo/wgu/down (+ next layer's wqkv) into the stream layout.

    Returns None when shapes don't fit (callers fall back to the separate
    kernels): wo [H, H], wgu [H, 2I], down [I, H], wqkv_next [H, Nq] with
    bn | H, bn | I, H | I, bn | Nq; int4-packed tensors unsupported.
    """
    qts = [wo, wgu, down] + ([wqkv_next] if wqkv_next is not None else [])
    if any(q.packed_rows for q in qts):
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
    # 1-byte quantized tiles (int8/fp8) or plain bf16 tiles with unit
    # scales (the bf16 giga stream) — anything else doesn't pack.
    ok_dt = jnp.dtype(dt).itemsize == 1 or jnp.dtype(dt) == jnp.bfloat16
    if any(q.q.dtype != dt for q in qts) or not ok_dt:
        return None
    bk = H
    for q in qts:
        if q.block_size % bk:
            return None
    n_qkv = 0
    if wqkv_next is not None:
        Hq, Nq = wqkv_next.q.shape
        if Hq != H or Nq % bn:
            return None
        n_qkv = Nq // bn

    fix = _w_scale_fixup(dt)

    def srow(qt: QTensor, k0: int, n0: int) -> jax.Array:
        return qt.scale[k0 // qt.block_size, n0 : n0 + bn] * fix

    tiles, scales = [], []
    for n in range(H // bn):  # wo [H, H]
        tiles.append(wo.q[:, n * bn : (n + 1) * bn])
        scales.append(srow(wo, 0, n * bn))
    for j in range(I // bn):  # wgu: interleave gate/up
        tiles.append(wgu.q[:, j * bn : (j + 1) * bn])
        scales.append(srow(wgu, 0, j * bn))
        tiles.append(wgu.q[:, I + j * bn : I + (j + 1) * bn])
        scales.append(srow(wgu, 0, I + j * bn))
    for k in range(I // bk):  # down [I, H], k-major
        for n in range(H // bn):
            tiles.append(down.q[k * bk : (k + 1) * bk, n * bn : (n + 1) * bn])
            scales.append(srow(down, k * bk, n * bn))
    for n in range(n_qkv):  # next layer's wqkv [H, Nq]
        tiles.append(wqkv_next.q[:, n * bn : (n + 1) * bn])
        scales.append(srow(wqkv_next, 0, n * bn))

    w = jnp.stack(tiles)
    s = jnp.stack([x.astype(jnp.float32) for x in scales])[:, None, :]
    return LayerPack(
        w=w, s=s, h_dim=H, i_dim=I, bn=bn,
        n_wo=H // bn, n_gu=2 * I // bn, n_down=(I // bk) * (H // bn),
        n_qkv=n_qkv,
    )


def _tail_kernel(
    att_ref,  # [B, H] VMEM (attention output)
    x_ref,  # [B, H] VMEM residual stream (pre-attention)
    gm_mlp_ref,  # [1, H] f32
    gm_nxt_ref,  # [1, H] f32 (dummy when n_qkv=0)
    s_ref,  # [T, 1, bn] f32 VMEM resident
    w_hbm,  # [T, bk, bn] ANY
    o_ref,  # [B, H]
    qkv_ref,  # [B, max(Nq, 128)]
    *,
    n_wo: int,
    n_gu: int,
    n_down: int,
    n_qkv: int,
    bn: int,
    H: int,
    eps: float,
    depth: int,
):
    n_tiles = n_wo + n_gu + n_down + n_qkv
    n_cols = H // bn
    cpb = H // bn  # h chunks per down K tile (bk == H)

    def body(wbuf, wsem):
        def copy(slot, t):
            return pltpu.make_async_copy(w_hbm.at[t], wbuf.at[slot],
                                         wsem.at[slot])

        for d in range(min(depth, n_tiles)):
            copy(d, d).start()

        att = att_ref[...].astype(jnp.bfloat16)
        gm = gm_mlp_ref[0]
        x1_chunks, h_chunks, qkv_out = [], [], []
        x1 = xn = g_val = x_out = xq = None
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
            elif t < n_wo + n_gu + n_down:
                jd = t - n_wo - n_gu
                k, n = divmod(jd, n_cols)
                hk = h_chunks[k * cpb : (k + 1) * cpb]
                xk = hk[0] if cpb == 1 else jnp.concatenate(hk, axis=1)
                p = (jax.lax.dot(xk, w, preferred_element_type=jnp.float32)
                     * s[None, :])
                acc[n] = p if acc[n] is None else acc[n] + p
                if jd == n_down - 1:
                    out = (acc[0] if n_cols == 1
                           else jnp.concatenate(acc, axis=1))
                    x_out = out + x1
                    o_ref[...] = x_out.astype(o_ref.dtype)
                    if n_qkv:
                        rstd = jax.lax.rsqrt(
                            jnp.mean(jnp.square(x_out), axis=-1,
                                     keepdims=True) + eps
                        )
                        xq = (x_out * rstd
                              * gm_nxt_ref[0][None, :]).astype(jnp.bfloat16)
            else:
                p = (jax.lax.dot(xq, w, preferred_element_type=jnp.float32)
                     * s[None, :])
                qkv_out.append(p.astype(qkv_ref.dtype))
            if t + depth < n_tiles:
                copy(slot, t + depth).start()

        if n_qkv:
            qkv_ref[...] = (qkv_out[0] if n_qkv == 1
                            else jnp.concatenate(qkv_out, axis=1))
        else:
            qkv_ref[...] = jnp.zeros_like(qkv_ref)

    pl.run_scoped(
        body,
        wbuf=pltpu.VMEM((depth, w_hbm.shape[1], bn), w_hbm.dtype),
        wsem=pltpu.SemaphoreType.DMA((depth,)),
    )


def mlp_qkv_fused(
    att: jax.Array,  # [..., H] attention output (prod(leading) <= 32)
    x: jax.Array,  # [..., H] residual stream
    gamma_mlp: jax.Array,  # [H]
    pack: LayerPack,
    gamma_next: Optional[jax.Array] = None,  # [H] when pack.n_qkv > 0
    *,
    eps: float = 1e-5,
    depth: int = 3,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """x1 = att @ wo + x; h = swiglu(rmsnorm(x1) @ wgu); x_out = h @ down
    + x1; qkv = rmsnorm(x_out, gamma_next) @ wqkv_next — one Pallas call,
    one uninterrupted weight stream. Returns (x_out like ``x``,
    qkv [..., Nq] or None when pack.n_qkv == 0)."""
    H, bn = pack.h_dim, pack.bn
    lead = x.shape[:-1]
    a2 = att.reshape(-1, H)
    x2 = x.reshape(-1, H)
    B = x2.shape[0]
    if B > 32:
        raise ValueError(f"mlp_qkv_fused is decode-only (M={B} > 32)")
    Nq = pack.n_qkv * bn
    gm_nxt = (gamma_next if gamma_next is not None
              else jnp.ones((H,), jnp.float32))

    interp = _interpret_default() if interpret is None else interpret
    if interp:
        x_out = _layer_tail_ref(a2, x2, gamma_mlp, pack, eps=eps)
        qkv = None
        if pack.n_qkv:
            qkv = _qkv_tail_ref(x_out, gm_nxt, pack, eps=eps)
            qkv = qkv.reshape(*lead, Nq)
        return x_out.reshape(*lead, H), qkv

    n_tiles = pack.n_wo + pack.n_gu + pack.n_down + pack.n_qkv
    tile_bytes = H * bn * pack.w.dtype.itemsize
    depth = max(2, min(depth, (6 * 1024 * 1024) // tile_bytes))
    x_out, qkv = pl.pallas_call(
        functools.partial(
            _tail_kernel,
            n_wo=pack.n_wo, n_gu=pack.n_gu, n_down=pack.n_down,
            n_qkv=pack.n_qkv, bn=bn, H=H, eps=eps, depth=depth,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H), x.dtype),
            jax.ShapeDtypeStruct((B, max(Nq, 128)), x.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (H * H + 3 * H * pack.i_dim + H * Nq),
            bytes_accessed=n_tiles * H * bn * pack.w.dtype.itemsize
            + 4 * B * H * 2,
            transcendentals=B * pack.i_dim,
        ),
        interpret=False,
    )(
        a2, x2, gamma_mlp.reshape(1, H).astype(jnp.float32),
        gm_nxt.reshape(1, H).astype(jnp.float32), pack.s, pack.w,
    )
    x_out = x_out.reshape(*lead, H)
    if pack.n_qkv == 0:
        return x_out, None
    return x_out, qkv[:, :Nq].reshape(*lead, Nq)


def _pack_qt(pack: LayerPack, i: int) -> QTensor:
    fix = _w_scale_fixup(pack.w.dtype)
    return QTensor(pack.w[i], pack.s[i] / fix, pack.h_dim, 0)


def _layer_tail_ref(att, x, gamma_mlp, pack: LayerPack, *, eps: float):
    """jnp oracle for the wo->rms->swiglu->down chain using the pack tiles."""
    from mila_tpu.inference.quantize import quant_linear_ref
    from mila_tpu.ops.rmsnorm import rms_norm
    from mila_tpu.ops.swiglu import swiglu

    H, bn = pack.h_dim, pack.bn
    t0 = 0
    wo_out = jnp.concatenate(
        [quant_linear_ref(att.astype(jnp.bfloat16), _pack_qt(pack, t0 + i))
         for i in range(pack.n_wo)], axis=-1)
    t0 += pack.n_wo
    x1 = (wo_out.astype(jnp.float32) + x.astype(jnp.float32)).astype(x.dtype)
    xn = rms_norm(x1, gamma_mlp, eps)
    h_chunks = []
    for _ in range(pack.n_gu // 2):
        g = quant_linear_ref(xn, _pack_qt(pack, t0)); t0 += 1
        u = quant_linear_ref(xn, _pack_qt(pack, t0)); t0 += 1
        h_chunks.append(swiglu(g, u))
    h = jnp.concatenate(h_chunks, axis=-1)
    n_cols = H // bn
    acc = None
    for k in range(pack.n_down // n_cols):
        hk = h[:, k * H : (k + 1) * H]
        row = jnp.concatenate(
            [quant_linear_ref(hk, _pack_qt(pack, t0 + k * n_cols + n))
             for n in range(n_cols)], axis=-1).astype(jnp.float32)
        acc = row if acc is None else acc + row
    return (acc + x1.astype(jnp.float32)).astype(x.dtype)


def _qkv_tail_ref(x_out, gamma_next, pack: LayerPack, *, eps: float):
    from mila_tpu.inference.quantize import quant_linear_ref
    from mila_tpu.ops.rmsnorm import rms_norm

    t0 = pack.n_wo + pack.n_gu + pack.n_down
    xq = rms_norm(x_out, gamma_next, eps)
    return jnp.concatenate(
        [quant_linear_ref(xq, _pack_qt(pack, t0 + i))
         for i in range(pack.n_qkv)], axis=-1)
