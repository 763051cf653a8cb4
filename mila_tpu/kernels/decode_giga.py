"""Whole-model decode step as ONE Pallas kernel: all L decoder layers
(attention + cache RMW + layer tail) plus the lm_head argmax, driven by a
single Mosaic-auto-pipelined weight stream.

Why: benchmarks/r5_stream_probe.py measured Mosaic's automatic grid
pipeline at 772 GB/s raw / 706 GB/s with the int8->bf16 convert+matmul
(1.49 us/tile), while the manual-DMA-ring kernels floor at ~2.43 us/tile
and every kernel boundary idles the DMA engine (two-kernel layer = 141
us/layer vs an 84+21 us isolated sum, benchmarks/r4_decomp.py). One kernel
for the WHOLE step removes every boundary: the weight stream never stops
from the first wqkv tile to the last lm_head tile, and attention runs in
the stream's compute slack.

Stream layout (``pack_giga``), uniform [bk=H, bn] tiles:

  [ wqkv_0 | layer 0: wo gu down wqkv_1 | ... | layer L-2: ... wqkv_{L-1}
  | layer L-1: wo gu down | lm_head ]

Grid = one step per tile. Step t's segment/layer are recovered from t with
compile-time constants; all per-layer state (residual, x1 chunks, swiglu
h, qkv of the NEXT layer, online-softmax m/l/acc) lives in VMEM scratch
indexed dynamically (same machinery as kernels/layer_stream.py).

Attention for layer l runs at the first tile of layer l's segment: the
lane-packed-query unpack / RoPE / aligned-RMW cache insert of
kernels/layer_mega.py, plus a double-buffered KV block ring whose first
two blocks are prefetched a whole segment early (at layer l-1's attention
step), so only the attention COMPUTE (~4 us) sits on the critical path.

The KV pool is STACKED [L, B, T, KD] and aliased through the kernel: the
cache insert is an in-kernel aligned-RMW row DMA, so the XLA
copy-on-write hazard that made r3's stacked pools slow (benchmarks/
r4_dus.py) does not apply.

Parity anchor: the reference caches one cuBLASLt plan per Linear with
fused epilogues (CudaLinearOp.ixx:147-225, 1037-1060); the TPU-native
endpoint of that idea is ONE resident plan for the entire decode step.

Inference-only (no VJP).
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mila_tpu.inference.quantize import QTensor
from mila_tpu.kernels.layer_fused import pack_layer
from mila_tpu.kernels.layer_mega import (
    permute_q_columns,
    permute_wo_rows,
    slot_order,
)
from mila_tpu.kernels.quant_matmul import _load_w, _w_scale_fixup

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


class GigaPack(NamedTuple):
    """Whole-model decode weight stream (see module doc)."""

    w: jax.Array  # [NTOT, bk, bn] int8/fp8
    s: jax.Array  # [NTOT, 1, bn] f32 (fp8 fixup folded)
    ga: jax.Array  # [L, H] f32 ln_attn gammas
    gm: jax.Array  # [L, H] f32 ln_mlp gammas
    gf: jax.Array  # [1, H] f32 final-norm gamma
    freq: Optional[jax.Array]  # [1, KD] f32 tiled rope freqs (token entry)
    sign: Optional[jax.Array]  # [1, KD] f32 pre-signed sin pattern
    h_dim: int
    i_dim: int
    bn: int
    n_wo: int
    n_gu: int
    n_down: int
    n_qkv: int
    n_layers: int
    n_head: int
    vocab: int
    nh: int
    nkv: int
    hd: int
    eps: float


jax.tree_util.register_pytree_node(
    GigaPack,
    lambda t: ((t.w, t.s, t.ga, t.gm, t.gf, t.freq, t.sign), tuple(t[7:])),
    lambda aux, leaves: GigaPack(*leaves, *aux),
)


def _tile_qt(qt: QTensor, bn: int, fix: float):
    """Column-tile a [K, N] QTensor into n [K, bn] tiles + scale rows."""
    K, N = qt.q.shape
    tiles, scales = [], []
    for n in range(N // bn):
        tiles.append(qt.q[:, n * bn : (n + 1) * bn])
        scales.append(qt.scale[0, n * bn : (n + 1) * bn] * fix)
    return tiles, scales


def pack_giga(
    layer_weights,  # list of (wo, wgu, down, wqkv) QTensors, token order
    head: QTensor,  # [H, VPAD] quantized lm_head (vocab padded to bn)
    ga: jax.Array,  # [L, H] ln_attn gammas
    gm: jax.Array,  # [L, H] ln_mlp gammas
    gf: jax.Array,  # [H] final-norm gamma
    *,
    nh: int,
    nkv: int,
    hd: int,
    vocab: int,
    eps: float = 1e-5,
    bn: int = 512,
    rope_inv_freq=None,  # [hd//2] f32: enables the tokens-in entry
) -> Optional[GigaPack]:
    """Build the whole-model stream. Returns None when shapes don't fit
    (callers keep the per-layer paths)."""
    L = len(layer_weights)
    if L == 0:
        return None
    H = layer_weights[0][0].q.shape[1]
    kd = nkv * hd
    if kd != bn or head.q.shape[0] != H or head.q.shape[1] % bn:
        return None
    if head.packed_rows or head.block_size != H:
        return None

    perm = []
    for i, (wo, wgu, down, wqkv) in enumerate(layer_weights):
        wo_p = permute_wo_rows(wo, nh, nkv, hd)
        wqkv_p = permute_q_columns(wqkv, nh, nkv, hd)
        if wo_p is None:
            return None
        perm.append((wo_p, wgu, down, wqkv_p))

    packs = []
    for i, (wo_p, wgu, down, _) in enumerate(perm):
        nxt = perm[i + 1][3] if i + 1 < L else None
        lp = pack_layer(wo_p, wgu, down, nxt, bn=bn)
        if lp is None or lp.bn != bn:
            return None
        packs.append(lp)
    first = packs[0]

    fix = _w_scale_fixup(layer_weights[0][3].q.dtype)
    qkv0_tiles, qkv0_scales = _tile_qt(perm[0][3], bn, fix)
    hfix = _w_scale_fixup(head.q.dtype)
    head_tiles, head_scales = _tile_qt(head, bn, hfix)
    # Pad the head with zero tiles until the TOTAL stream length divides by
    # 8: lets giga_decode_step group up to 8 tiles per grid step (tps),
    # amortizing the ~1 us per-grid-step overhead (benchmarks/
    # r5_stream_probe.py). Zero tiles emit logits for columns >= vocab,
    # which the in-kernel argmax masks to -inf anyway; the waste is
    # <= 7 tiles (~0.6% of the stream).
    tpl = first.n_wo + first.n_gu + first.n_down + first.n_qkv
    ntot = L * tpl + len(head_tiles)
    for _ in range((-ntot) % 8):
        head_tiles.append(jnp.zeros_like(head_tiles[0]))
        head_scales.append(jnp.zeros_like(head_scales[0]))

    w = jnp.concatenate(
        [jnp.stack(qkv0_tiles)] + [p.w for p in packs]
        + [jnp.stack(head_tiles)]
    )
    s = jnp.concatenate(
        [jnp.stack(qkv0_scales)[:, None, :]] + [p.s for p in packs]
        + [jnp.stack(head_scales)[:, None, :]]
    )
    freq = sign = None
    if rope_inv_freq is not None:
        # Full-width tiled rope rows for the in-kernel tables: lane k of
        # the [1, KD] row carries inv_freq[(k % hd) % (hd//2)]; the sign
        # row is the pre-signed [-sin | sin] split-half pattern.
        d2 = hd // 2
        inv = np.asarray(rope_inv_freq, np.float32).reshape(d2)
        kidx = np.arange(kd)
        freq = jnp.asarray(inv[(kidx % hd) % d2][None, :], jnp.float32)
        sign = jnp.asarray(
            np.where((kidx % hd) < d2, -1.0, 1.0)[None, :], jnp.float32)
    return GigaPack(
        w=w, s=s,
        ga=jnp.asarray(ga, jnp.float32).reshape(L, H),
        gm=jnp.asarray(gm, jnp.float32).reshape(L, H),
        gf=jnp.asarray(gf, jnp.float32).reshape(1, H),
        freq=freq, sign=sign,
        h_dim=H, i_dim=first.i_dim, bn=bn,
        n_wo=first.n_wo, n_gu=first.n_gu, n_down=first.n_down,
        n_qkv=first.n_qkv, n_layers=L,
        n_head=len(head_tiles), vocab=vocab,
        nh=nh, nkv=nkv, hd=hd, eps=eps,
    )


def _giga_kernel(
    lens_ref,  # SMEM [B] int32: OLD cache rows per sequence
    tid_ref,  # SMEM [B] int32 current token ids (embed_rope mode; zeros
    #           in the x-input mode)
    x_ref,  # [B, H] VMEM embedded-token row | [V, H] ANY wte (embed_rope)
    cos_ref,  # [B, KD] f32 tiled cos | [1, KD] freq row (embed_rope)
    sin_ref,  # [B, KD] f32 pre-signed | [1, KD] sign row (embed_rope)
    ga_ref,  # [L, H] f32
    gm_ref,  # [L, H] f32
    gf_ref,  # [1, H] f32
    w_ref,  # [1, bk, bn] auto-pipelined weight tile
    s_ref,  # [1, 1, bn] auto-pipelined scale row
    k_hbm,  # [L, B, T, KD] ANY (aliased to k_out)
    v_hbm,
    tok_ref,  # [B, 1] int32 out
    log_hbm,  # [B, VPAD] bf16 out (ANY) — manual per-tile DMA: the auto
    #           out pipeline's revisited-block flush lags one step, so a
    #           block revisited for 900+ steps lands the NEXT tile's data
    ko_ref,  # aliased pass-through + RMW row write-back
    vo_ref,
    # --- scratch ---
    kbuf,  # VMEM [2, B, bt, KD]
    vbuf,
    ksem,  # DMA (2,)
    vsem,
    wrsem,  # DMA (RMW rows)
    lg_scr,  # VMEM [2, B, bn] bf16 logits-chunk ring
    lgsem,  # DMA (2,)
    x1_scr,  # [n_wo, B, bn] f32
    xn_scr,  # [B, H] bf16 (normed operand for gu / qkv / head)
    g_scr,  # [B, bn] f32
    h_scr,  # [n_gu // 2, B, bn] bf16
    dn_scr,  # [n_cols, B, bn] f32
    qkv_scr,  # [n_qkv, B, bn] f32 (NEXT layer's raw projection)
    att_scr,  # [B, NQ] bf16 (flattened slot-order attention)
    xres_scr,  # [B, H] f32 residual stream
    m_scr,  # [B, NH, 1] f32
    l_scr,  # [B, NH, 1] f32
    acc_scr,  # [B, NH, KD] f32
    bv_scr,  # [B, 1] f32 running argmax value
    bi_scr,  # [B, 1] i32
    x_scr,  # [B, H] bf16 (embed_rope: embedded rows land here)
    cos_scr,  # [B, KD] f32 (embed_rope: in-kernel rope tables)
    sin_scr,
    embsem,  # DMA (embed row fetches)
    *rowbufs,  # 2*B x [8, KD] RMW row buffers, then B x [8, H] embed rows
    n_wo: int,
    n_gu: int,
    n_down: int,
    n_qkv: int,
    bn: int,
    H: int,
    I: int,
    eps: float,
    batch: int,
    nkv: int,
    group: int,
    hd: int,
    T: int,
    bt: int,
    L: int,
    n_head: int,
    vocab: int,
    sm_scale: float,
    tps: int,
    embed_rope: bool,
):
    rowk = rowbufs[:batch]
    rowv = rowbufs[batch : 2 * batch]
    embrow = rowbufs[2 * batch :]
    X = x_scr if embed_rope else x_ref
    COS = cos_scr if embed_rope else cos_ref
    SIN = sin_scr if embed_rope else sin_ref
    nh = nkv * group
    kd = nkv * hd
    nq = nh * hd
    n_cols = H // bn
    cpb = H // bn  # h chunks per down K tile (bk == H)
    tpl = n_wo + n_gu + n_down + n_qkv
    last_down = n_wo + n_gu + n_down - 1
    head_base = n_qkv + L * tpl - n_qkv  # layer L-1 has no qkv tiles
    nb = T // bt

    t = pl.program_id(0)
    maxlen = lens_ref[0]
    for b in range(1, batch):
        maxlen = jnp.maximum(maxlen, lens_ref[b])


    def kv_copy(lyr, blk, slot):
        return (
            pltpu.make_async_copy(
                k_hbm.at[lyr, :, pl.ds(blk * bt, bt)], kbuf.at[slot], ksem.at[slot]
            ),
            pltpu.make_async_copy(
                v_hbm.at[lyr, :, pl.ds(blk * bt, bt)], vbuf.at[slot], vsem.at[slot]
            ),
        )

    def prefetch_layer_kv(lyr):
        # First two KV blocks of ``lyr`` into slots 0/1 — issued a whole
        # segment ahead of their consumption (module doc).
        for blk in range(min(2, nb)):
            @pl.when(blk * bt < maxlen)
            def _(blk=blk):
                ck, cv = kv_copy(lyr, blk, blk)
                ck.start()
                cv.start()

    def rd_blk(b):
        # 8-row-aligned RMW around lens[b]; clamp BEFORE aligning (Mosaic
        # proves x//8*8, not min(x*8, c)); at lens==T the RMW rewrites the
        # last block unchanged instead of an OOB DMA.
        return (jnp.minimum(lens_ref[b], T - 1) // 8) * 8

    def rope(xv, c, sg):
        lo = jnp.roll(xv, -(hd // 2), axis=1)
        hi = jnp.roll(xv, hd // 2, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, xv.shape, 1)
        y = jnp.where(lane % hd < hd // 2, lo, hi)
        return xv * c + y * sg

    def rms_rows(xf, gamma):
        rstd = jax.lax.rsqrt(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps
        )
        return (xf * rstd * gamma[None, :]).astype(jnp.bfloat16)

    # ---------------- t == 0: prologue ----------------
    @pl.when(t == 0)
    def _prologue():
        if embed_rope:
            # Embedding lookup in-kernel: 8-row-aligned wte block DMAs
            # (arbitrary token rows aren't DMA-alignable), row-selected on
            # the VPU. Plus the rope tables from lens x the tiled freq
            # row — the decode step has NO per-step XLA glue left.
            for b in range(batch):
                st = (tid_ref[b] // 8) * 8
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(st, 8)], embrow[b], embsem).start()
            for b in range(batch):
                ang = (lens_ref[b].astype(jnp.float32)
                       * cos_ref[0][None, :])
                cos_scr[b : b + 1] = jnp.cos(ang)
                sin_scr[b : b + 1] = sin_ref[0][None, :] * jnp.sin(ang)
            rowid8 = jax.lax.broadcasted_iota(jnp.int32, (8, H), 0)
            for b in range(batch):
                st = (tid_ref[b] // 8) * 8
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(st, 8)], embrow[b], embsem).wait()
                r = tid_ref[b] - st
                row = jnp.sum(
                    jnp.where(rowid8 == r,
                              embrow[b][...].astype(jnp.float32), 0.0),
                    axis=0, keepdims=True)
                x_scr[b : b + 1] = row.astype(x_scr.dtype)
        xf = X[...].astype(jnp.float32)
        xres_scr[...] = xf
        xn_scr[...] = rms_rows(xf, ga_ref[0])
        bv_scr[...] = jnp.full(bv_scr.shape, -jnp.inf, jnp.float32)
        bi_scr[...] = jnp.zeros(bi_scr.shape, jnp.int32)
        prefetch_layer_kv(0)

    def process_tile(tt, w, s):
        # Layer/segment coordinates for THIS tile (tt >= n_qkv side;
        # clamped elsewhere).
        tl = tt - n_qkv
        l = jax.lax.div(tl, tpl)  # correct for the short last layer too:
        # tl in [ (L-1)*tpl, (L-1)*tpl + tpl - n_qkv ) still divides to L-1
        j = tl - l * tpl
        ht = tt - head_base

        in_qkv0 = tt < n_qkv
        in_layers = (tt >= n_qkv) & (tt < head_base)
        in_head = tt >= head_base

        # ---------------- qkv0 segment: tiles 0..n_qkv-1 ----------------
        @pl.when(in_qkv0)
        def _qkv0():
            p = jax.lax.dot(xn_scr[...], w,
                            preferred_element_type=jnp.float32)
            qkv_scr[tt] = p * s[None, :]

        # ---------------- attention at j == 0 of each layer ----------------
        @pl.when(in_layers & (j == 0))
        def _attention():
            # RMW row reads for this layer's cache insert.
            for b in range(batch):
                st = rd_blk(b)
                pltpu.make_async_copy(
                    ko_ref.at[l, b, pl.ds(st, 8)], rowk[b], wrsem).start()
                pltpu.make_async_copy(
                    vo_ref.at[l, b, pl.ds(st, 8)], rowv[b], wrsem).start()

            # Raw projection row (slot order) from the previous segment.
            q_rows = jnp.concatenate(
                [qkv_scr[c] for c in range(n_qkv - 2)], axis=1
            )  # [B, NQ] f32
            kn = rope(qkv_scr[n_qkv - 2], COS[...], SIN[...])  # [B, KD]
            vn = qkv_scr[n_qkv - 1]

            # Lane-packed queries via the MXU unpack (layer_mega module doc).
            lane_nq = jax.lax.broadcasted_iota(jnp.int32, (nh, nq), 1)
            row_nq = jax.lax.broadcasted_iota(jnp.int32, (nh, nq), 0)
            sel = (lane_nq >= row_nq * hd) & (lane_nq < (row_nq + 1) * hd)
            ones_col = jnp.ones((nh, 1), jnp.bfloat16)
            q_pk = []
            for b in range(batch):
                bc = jax.lax.dot(
                    ones_col, q_rows[b : b + 1].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
                m = jnp.where(sel, bc, 0.0)
                packed = None
                for c in range(nq // kd):
                    part = m[:, c * kd : (c + 1) * kd]
                    packed = part if packed is None else packed + part
                q_pk.append(
                    rope(packed, COS[b][None, :], SIN[b][None, :])
                    .astype(jnp.bfloat16))

            # RMW insert of the new row (write-back overlaps the block loop).
            for b in range(batch):
                pltpu.make_async_copy(
                    ko_ref.at[l, b, pl.ds(rd_blk(b), 8)], rowk[b], wrsem).wait()
                pltpu.make_async_copy(
                    vo_ref.at[l, b, pl.ds(rd_blk(b), 8)], rowv[b], wrsem).wait()
            rowid = jax.lax.broadcasted_iota(jnp.int32, (8, kd), 0)
            for b in range(batch):
                r = lens_ref[b] - rd_blk(b)
                k8 = jnp.where(rowid == r,
                               jnp.broadcast_to(kn[b : b + 1], (8, kd)),
                               rowk[b][...].astype(jnp.float32))
                v8 = jnp.where(rowid == r,
                               jnp.broadcast_to(vn[b : b + 1], (8, kd)),
                               rowv[b][...].astype(jnp.float32))
                rowk[b][...] = k8.astype(rowk[b].dtype)
                rowv[b][...] = v8.astype(rowv[b].dtype)
            for b in range(batch):
                st = rd_blk(b)
                pltpu.make_async_copy(
                    rowk[b], ko_ref.at[l, b, pl.ds(st, 8)], wrsem).start()
                pltpu.make_async_copy(
                    rowv[b], vo_ref.at[l, b, pl.ds(st, 8)], wrsem).start()

            # Online softmax over the prefetched KV block ring.
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)
            col_t = jax.lax.broadcasted_iota(jnp.int32, (nh, bt), 1)
            for blk in range(nb):
                @pl.when(blk * bt < maxlen)
                def _(blk=blk):
                    slot = blk % 2
                    ck, cv = kv_copy(l, blk, slot)
                    ck.wait()
                    cv.wait()
                    for b in range(batch):
                        length = lens_ref[b]
                        sc = jax.lax.dot_general(
                            q_pk[b], kbuf[slot, b].astype(jnp.bfloat16),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ) * sm_scale  # [NH, bt]
                        sc = jnp.where(col_t + blk * bt < length, sc, MASK_VALUE)
                        m_prev = m_scr[b]
                        m_next = jnp.maximum(m_prev, sc.max(axis=1, keepdims=True))
                        alpha = jnp.exp(m_prev - m_next)
                        p = jnp.exp(sc - m_next)
                        l_scr[b] = alpha * l_scr[b] + jnp.sum(p, axis=1,
                                                              keepdims=True)
                        m_scr[b] = m_next
                        pv = jax.lax.dot(
                            p.astype(jnp.bfloat16),
                            vbuf[slot, b].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                        acc_scr[b] = acc_scr[b] * alpha + pv
                    if blk + 2 < nb:
                        @pl.when((blk + 2) * bt < maxlen)
                        def _():
                            ck2, cv2 = kv_copy(l, blk + 2, slot)
                            ck2.start()
                            cv2.start()

            # Finalize: current token joins in-register; per-slot lane select;
            # MXU flatten [NH, HD] -> [1, NQ] (slot order matches wo rows).
            lane_hd = jax.lax.broadcasted_iota(jnp.int32, (nh, nq), 1)
            row_hd = jax.lax.broadcasted_iota(jnp.int32, (nh, nq), 0)
            sel2 = (lane_hd >= row_hd * hd) & (lane_hd < (row_hd + 1) * hd)
            ones_row = jnp.ones((1, nh), jnp.float32)
            slot_kv = jax.lax.broadcasted_iota(jnp.int32, (nh, 1), 0) % nkv
            for b in range(batch):
                s_cur = jnp.sum(
                    q_pk[b].astype(jnp.float32) * kn[b : b + 1], axis=1,
                    keepdims=True) * sm_scale
                m_fin = jnp.maximum(m_scr[b], s_cur)
                alpha = jnp.exp(m_scr[b] - m_fin)
                p_cur = jnp.exp(s_cur - m_fin)
                lsum = l_scr[b] * alpha + p_cur
                acc = acc_scr[b] * alpha + p_cur * vn[b : b + 1]
                acc = acc / jnp.where(lsum == 0.0, 1.0, lsum)
                att = None
                for jj in range(nkv):
                    part = acc[:, jj * hd : (jj + 1) * hd] * (slot_kv == jj)
                    att = part if att is None else att + part
                tiled = jnp.concatenate([att] * (nq // hd), axis=1)
                mt = jnp.where(sel2, tiled, 0.0)
                att_scr[b : b + 1] = jax.lax.dot(
                    ones_row, mt, preferred_element_type=jnp.float32
                ).astype(att_scr.dtype)

            # Prefetch the NEXT layer's first KV blocks; await the RMW
            # write-back so its semaphore is drained before reuse.
            @pl.when(l + 1 < L)
            def _():
                prefetch_layer_kv(l + 1)
            for b in range(batch):
                st = rd_blk(b)
                pltpu.make_async_copy(
                    rowk[b], ko_ref.at[l, b, pl.ds(st, 8)], wrsem).wait()
                pltpu.make_async_copy(
                    rowv[b], vo_ref.at[l, b, pl.ds(st, 8)], wrsem).wait()

        # ---------------- layer tail over the weight stream ----------------
        @pl.when(in_layers & (j < n_wo))
        def _wo():
            att = att_scr[...]
            p = jax.lax.dot(att, w, preferred_element_type=jnp.float32)
            xc = xres_scr[:, :bn]
            for c in range(1, n_wo):
                xc = jnp.where(j == c, xres_scr[:, c * bn : (c + 1) * bn], xc)
            x1_scr[j] = p * s[None, :] + xc

            @pl.when(j == n_wo - 1)
            def _norm():
                x1 = jnp.concatenate([x1_scr[c] for c in range(n_wo)], axis=1)
                xn_scr[...] = rms_rows(x1, gm_ref[l])

        @pl.when(in_layers & (j >= n_wo) & (j < n_wo + n_gu))
        def _gu():
            jg = j - n_wo
            p = (jax.lax.dot(xn_scr[...], w, preferred_element_type=jnp.float32)
                 * s[None, :])

            @pl.when(jg % 2 == 0)
            def _gate():
                g_scr[...] = p

            @pl.when(jg % 2 == 1)
            def _up():
                g = g_scr[...]
                h_scr[jg // 2] = (g * jax.nn.sigmoid(g) * p).astype(jnp.bfloat16)

        @pl.when(in_layers & (j >= n_wo + n_gu) & (j <= last_down))
        def _down():
            jd = j - n_wo - n_gu
            kk = jd // n_cols
            nn = jd % n_cols
            xk = (jnp.concatenate(
                [h_scr[kk * cpb + c] for c in range(cpb)], axis=1)
                if cpb > 1 else h_scr[kk * cpb])
            p = (jax.lax.dot(xk, w, preferred_element_type=jnp.float32)
                 * s[None, :])

            @pl.when(kk == 0)
            def _first():
                dn_scr[nn] = p

            @pl.when(kk > 0)
            def _rest():
                dn_scr[nn] = dn_scr[nn] + p

            @pl.when(jd == n_down - 1)
            def _finish():
                x1 = jnp.concatenate([x1_scr[c] for c in range(n_wo)], axis=1)
                out = jnp.concatenate([dn_scr[c] for c in range(n_cols)], axis=1)
                x_out = out + x1
                xres_scr[...] = x_out

                @pl.when(l + 1 < L)
                def _():
                    xn_scr[...] = rms_rows(x_out, ga_ref[jnp.minimum(l + 1,
                                                                     L - 1)])

        @pl.when(in_layers & (j > last_down))
        def _qkv():
            nn = j - last_down - 1
            p = jax.lax.dot(xn_scr[...], w, preferred_element_type=jnp.float32)
            qkv_scr[nn] = p * s[None, :]

        # ---------------- lm_head ----------------
        @pl.when(in_head & (ht == 0))
        def _head_norm():
            xn_scr[...] = rms_rows(xres_scr[...], gf_ref[0])

        @pl.when(in_head)
        def _head():
            p = (jax.lax.dot(xn_scr[...], w, preferred_element_type=jnp.float32)
                 * s[None, :])

            def lg_copy(step, slot):
                return pltpu.make_async_copy(
                    lg_scr.at[slot],
                    log_hbm.at[:, pl.ds(step * bn, bn)],
                    lgsem.at[slot],
                )

            slot = jax.lax.rem(ht, 2)

            @pl.when(ht >= 2)
            def _drain():
                lg_copy(ht - 2, slot).wait()

            lg_scr[slot] = p.astype(lg_scr.dtype)
            lg_copy(ht, slot).start()

            col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) + ht * bn
            logits = jnp.where(col < vocab, p, -jnp.inf)
            val = jnp.max(logits, axis=1, keepdims=True)
            idx = (jnp.argmax(logits, axis=1).astype(jnp.int32)[:, None]
                   + ht * bn)
            better = val > bv_scr[...]  # strict: first occurrence wins ties
            bv_scr[...] = jnp.where(better, val, bv_scr[...])
            bi_scr[...] = jnp.where(better, idx, bi_scr[...])

            @pl.when(ht == n_head - 1)
            def _emit():
                tok_ref[...] = bi_scr[...]
                lg_copy(ht, slot).wait()
                if n_head >= 2:
                    lg_copy(ht - 1, 1 - slot).wait()


    # ``tps`` tiles per grid step: per-step overhead (branch predicates,
    # scalar coordinate math, pipeline handshakes) measured ~1 us/step at
    # tps=1 — 2.44 us/tile against the 1.49 us/tile branch-free probe
    # (benchmarks/r5_stream_probe.py). Amortize it across the group.
    #
    # NOTE: feeding the s8 tile directly to the dots (mixed bf16 x s8)
    # measures FASTER in a single-dot probe (1.42 vs 1.51 us/tile,
    # r5_stream_probe ``mixed``) but 3x SLOWER here (6.3 vs 2.2 ms/step):
    # the tile feeds several predicated dots and Mosaic re-lowers the
    # operand per branch. One up-front VPU convert wins in this kernel.
    for i in range(tps):
        process_tile(t * tps + i, _load_w(w_ref[i]), s_ref[i, 0])


def giga_decode_step(
    x: jax.Array,  # [B, H] embedded current-token row
    cos_t: jax.Array,  # [B, KD] full-width tiled cos
    sin_t: jax.Array,  # [B, KD] pre-signed tiled sin
    old_lens: jax.Array,  # [B] int32: live cache rows per sequence
    pack: GigaPack,
    k_pool: jax.Array,  # [L, B, T, NKV*HD] stacked cache (donated; kept
    #                     4-D end-to-end — a 5-D carried pool gets a
    #                     different XLA layout and the loop-body reshape
    #                     becomes FOUR 134MB layout-conversion copies per
    #                     step, ~656 us: benchmarks/r5_branch_probe.py)
    v_pool: jax.Array,
    *,
    scale: Optional[float] = None,
    block_t: int = 128,
    interpret: Optional[bool] = None,
    pallas_interpret: bool = False,  # debug: run the REAL kernel body under
    #                                  the pallas CPU emulator
    tokens: Optional[jax.Array] = None,  # [B] int32: embed_rope mode — x
    #           is then the full wte [V, H] and cos_t/sin_t are ignored
    #           (the kernel embeds + builds rope tables itself)
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One full decode step. Returns (token [B,1] i32 greedy argmax,
    logits [B, VPAD] bf16, k_pool', v_pool') — pools updated in place at
    row old_lens[b] of every layer."""
    embed_rope = tokens is not None
    L, B, T, KD = k_pool.shape
    NKV, HD = pack.nkv, pack.hd
    H, I, bn = pack.h_dim, pack.i_dim, pack.bn
    NH = pack.nh
    assert KD == NKV * HD, (k_pool.shape, NKV, HD)
    sm_scale = 1.0 / math.sqrt(HD) if scale is None else scale
    if T % 8:
        raise ValueError(f"giga_decode_step needs T % 8 == 0 (got {T})")
    assert pack.n_layers == L

    if embed_rope:
        assert pack.freq is not None, "pack_giga needs rope_inv_freq"
        assert x.shape[0] % 8 == 0, "wte vocab rows must be 8-aligned"

    interp = _interpret_default() if interpret is None else interpret
    if interp and not pallas_interpret:
        if embed_rope:
            xe = jnp.take(x, tokens.reshape(-1), axis=0).astype(jnp.bfloat16)
            ang = old_lens[:, None].astype(jnp.float32) * pack.freq
            cos_t = jnp.cos(ang)
            sin_t = pack.sign * jnp.sin(ang)
            return _giga_ref(xe, cos_t, sin_t, old_lens, pack, k_pool,
                             v_pool, sm_scale=sm_scale)
        return _giga_ref(x, cos_t, sin_t, old_lens, pack, k_pool, v_pool,
                         sm_scale=sm_scale)

    bt = min(block_t, T)
    while T % bt:
        bt //= 2
    tpl = pack.n_wo + pack.n_gu + pack.n_down + pack.n_qkv
    head_base = pack.n_qkv + L * tpl - pack.n_qkv
    ntot = head_base + pack.n_head
    assert pack.w.shape[0] == ntot, (pack.w.shape, ntot)
    k2, v2 = k_pool, v_pool

    # Tiles per grid step (kernel doc): the deepest group that divides the
    # stream AND keeps the double-buffered weight blocks inside a 24MB
    # budget — 8 for int8/fp8 (1MB tiles), 4 for bf16 (2MB tiles). Deeper
    # groups amortize the ~1 us per-grid-step overhead measured by
    # benchmarks/r5_stream_probe.py (pack_giga pads the head so ntot
    # divides by 8).
    # tps=8 measured 7.06 ms/step (Mosaic stops double-buffering the 8MB
    # blocks); 4 is the measured optimum for int8 (2.214 vs 2.314 at 2).
    tile_bytes = H * bn * pack.w.dtype.itemsize
    tps = 1
    for cand in (4, 2):
        if ntot % cand == 0 and 2 * cand * tile_bytes <= 24 * 1024 * 1024:
            tps = cand
            break
    env_tps = os.environ.get("MILA_GIGA_TPS")
    if env_tps:  # experiment knob (benchmarks/r5_giga.py sweeps)
        tps = int(env_tps)
        assert ntot % tps == 0, (ntot, tps)
    grid = (ntot // tps,)
    if not embed_rope:
        tokens = jnp.zeros((B,), jnp.int32)
        x_in = x
        cs_spec = pl.BlockSpec((B, KD), lambda t, *_: (0, 0))
        x_spec = pl.BlockSpec((B, H), lambda t, *_: (0, 0))
        cos_in = cos_t.astype(jnp.float32)
        sin_in = sin_t.astype(jnp.float32)
        emb_dtype = jnp.bfloat16
    else:
        # embed_rope mode: x is the full wte [V, H] (ANY space), cos/sin
        # are the [1, KD] tiled freq/sign rows from the pack.
        x_in = x
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        cs_spec = pl.BlockSpec((1, KD), lambda t, *_: (0, 0))
        cos_in = pack.freq
        sin_in = pack.sign
        emb_dtype = x.dtype
    tok, logits, k_out, v_out = pl.pallas_call(
        functools.partial(
            _giga_kernel,
            n_wo=pack.n_wo, n_gu=pack.n_gu, n_down=pack.n_down,
            n_qkv=pack.n_qkv, bn=bn, H=H, I=I, eps=pack.eps, batch=B,
            nkv=NKV, group=NH // NKV, hd=HD, T=T, bt=bt, L=L,
            n_head=pack.n_head, vocab=pack.vocab, sm_scale=sm_scale,
            tps=tps, embed_rope=embed_rope,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                x_spec,
                cs_spec,
                cs_spec,
                pl.BlockSpec((L, H), lambda t, *_: (0, 0)),
                pl.BlockSpec((L, H), lambda t, *_: (0, 0)),
                pl.BlockSpec((1, H), lambda t, *_: (0, 0)),
                pl.BlockSpec((tps, H, bn), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((tps, 1, bn), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=(
                pl.BlockSpec((B, 1), lambda t, *_: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, B, bt, KD), k_pool.dtype),
                pltpu.VMEM((2, B, bt, KD), v_pool.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
                pltpu.VMEM((2, B, bn), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((pack.n_wo, B, bn), jnp.float32),
                pltpu.VMEM((B, H), jnp.bfloat16),
                pltpu.VMEM((B, bn), jnp.float32),
                pltpu.VMEM((pack.n_gu // 2, B, bn), jnp.bfloat16),
                pltpu.VMEM((H // bn, B, bn), jnp.float32),
                pltpu.VMEM((pack.n_qkv, B, bn), jnp.float32),
                pltpu.VMEM((B, NH * HD), jnp.bfloat16),
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, NH, 1), jnp.float32),
                pltpu.VMEM((B, NH, 1), jnp.float32),
                pltpu.VMEM((B, NH, KD), jnp.float32),
                pltpu.VMEM((B, 1), jnp.float32),
                pltpu.VMEM((B, 1), jnp.int32),
                pltpu.VMEM((B, H), jnp.bfloat16),
                pltpu.VMEM((B, KD), jnp.float32),
                pltpu.VMEM((B, KD), jnp.float32),
                pltpu.SemaphoreType.DMA,
                *[pltpu.VMEM((8, KD), k_pool.dtype) for _ in range(2 * B)],
                *[pltpu.VMEM((8, H), emb_dtype) for _ in range(B)],
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, pack.n_head * bn), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, T, KD), k_pool.dtype),
            jax.ShapeDtypeStruct((L, B, T, KD), v_pool.dtype),
        ),
        # args: [lens, tok, x, cos, sin, ga, gm, gf, w, s, k2, v2]
        input_output_aliases={10: 2, 11: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # bf16 streams carry 2MB tiles; the branchy one-kernel body
            # makes Mosaic's scoped(stack) vmem exceed the 16MB default
            # (measured 33.7MB at Llama-1B bf16; int8 at tps=4 needs
            # 17.2MB). v5e has 128MB VMEM — raise the scoped limit just
            # enough for the configuration. Do NOT raise it blanket to
            # 100MB: that measured +0.2 ms/step on the int8 tps=2 stream
            # (Mosaic pipelines less aggressively near a high limit).
            **({"vmem_limit_bytes": 100 * 1024 * 1024}
               if pack.w.dtype.itemsize > 1 else
               {"vmem_limit_bytes": 24 * 1024 * 1024} if tps >= 4 else {}),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (L * (H * H + H * (NH + 2 * NKV) * HD
                                + 3 * H * I + 2 * NH * T * HD)
                           + H * pack.n_head * bn),
            bytes_accessed=pack.w.nbytes + pack.s.nbytes
            + 2 * L * B * T * KD * k_pool.dtype.itemsize,
            transcendentals=B * L * (I + NH * T),
        ),
        interpret=pallas_interpret,
    )(
        old_lens.astype(jnp.int32), tokens.astype(jnp.int32).reshape(B),
        x_in, cos_in, sin_in, pack.ga, pack.gm, pack.gf,
        pack.w, pack.s, k2, v2,
    )
    return tok, logits, k_out, v_out


def _giga_ref(x, cos_t, sin_t, old_lens, pack: GigaPack, k_pool, v_pool,
              *, sm_scale):
    """jnp oracle: per-layer mega-layer semantics + the argmax head, built
    from per-layer views of the stacked stream."""
    from mila_tpu.kernels.layer_fused import (
        LayerPack, _layer_tail_ref, _qkv_tail_ref,
    )
    from mila_tpu.ops.attention import decode_attention

    L, B, T, KD = k_pool.shape
    NKV, HD = pack.nkv, pack.hd
    H, bn = pack.h_dim, pack.bn
    NH = pack.nh
    NQ = NH * HD
    tpl = pack.n_wo + pack.n_gu + pack.n_down + pack.n_qkv
    eps = pack.eps

    def rms(xf, gamma):
        xf = xf.astype(jnp.float32)
        rstd = jax.lax.rsqrt(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
        return (xf * rstd * gamma[None, :]).astype(jnp.bfloat16)

    def mm(xb, w_tiles, s_tiles):
        # [B, H] @ stacked column tiles -> [B, n*bn] f32
        outs = []
        for i in range(w_tiles.shape[0]):
            wt = w_tiles[i]
            spec = wt.astype(jnp.float32)  # int8 exact; fp8 via fixup in s
            if jnp.dtype(wt.dtype) != jnp.int8:
                spec = _load_w(wt).astype(jnp.float32)
            p = xb.astype(jnp.float32) @ spec
            outs.append(p * s_tiles[i, 0][None, :])
        return jnp.concatenate(outs, axis=1)

    def rope_flat(xv, c, sg):
        xg = xv.reshape(*xv.shape[:-1], xv.shape[-1] // HD, HD)
        y = jnp.concatenate([xg[..., HD // 2:], xg[..., : HD // 2]], -1)
        y = y.reshape(xv.shape)
        return (xv.astype(jnp.float32) * c + y.astype(jnp.float32) * sg)

    xres = x.astype(jnp.float32)
    qkv = mm(rms(xres, pack.ga[0]), pack.w[: pack.n_qkv],
             pack.s[: pack.n_qkv])
    kc_all, vc_all = [], []
    slots = slot_order(NH, NKV)
    inv = np.argsort(slots)
    for l in range(L):
        base = pack.n_qkv + l * tpl
        n_qkv_l = pack.n_qkv if l + 1 < L else 0

        q = qkv[:, :NQ]
        cq = jnp.tile(cos_t[:, :HD].astype(jnp.float32), (1, NH))
        sq = jnp.tile(sin_t[:, :HD].astype(jnp.float32), (1, NH))
        q_r = rope_flat(q, cq, sq).reshape(B, NH, HD)  # slot order
        k_new = rope_flat(qkv[:, NQ : NQ + KD], cos_t.astype(jnp.float32),
                          sin_t.astype(jnp.float32))
        v_new = qkv[:, NQ + KD :]

        rows = jnp.arange(B)
        kc = k_pool[l]
        vc = v_pool[l]
        kc = kc.at[rows, old_lens].set(k_new.astype(kc.dtype))
        vc = vc.at[rows, old_lens].set(v_new.astype(vc.dtype))
        kc_all.append(kc)
        vc_all.append(vc)

        q_h = q_r[:, jnp.asarray(inv)]
        att = decode_attention(
            q_h[:, None], kc.reshape(B, T, NKV, HD),
            vc.reshape(B, T, NKV, HD), old_lens + 1,
            scale=sm_scale)[:, 0]
        att_slot = att[:, jnp.asarray(slots)].reshape(B, NQ)

        n_tiles_l = tpl - (pack.n_qkv - n_qkv_l)
        lp = LayerPack(
            w=pack.w[base : base + n_tiles_l],
            s=pack.s[base : base + n_tiles_l],
            h_dim=H, i_dim=pack.i_dim, bn=bn, n_wo=pack.n_wo,
            n_gu=pack.n_gu, n_down=pack.n_down, n_qkv=n_qkv_l,
        )
        xres = _layer_tail_ref(att_slot.astype(jnp.bfloat16),
                               xres.astype(jnp.bfloat16),
                               pack.gm[l], lp, eps=eps).astype(jnp.float32)
        if n_qkv_l:
            qkv = _qkv_tail_ref(xres, pack.ga[l + 1], lp, eps=eps)

    head_base = pack.n_qkv + L * tpl - pack.n_qkv
    logits = mm(rms(xres, pack.gf[0]),
                pack.w[head_base:], pack.s[head_base:])
    col = jnp.arange(logits.shape[1])[None, :]
    masked = jnp.where(col < pack.vocab, logits, -jnp.inf)
    tok = jnp.argmax(masked, axis=1).astype(jnp.int32)[:, None]
    return (tok, logits.astype(jnp.bfloat16),
            jnp.stack(kc_all), jnp.stack(vc_all))
