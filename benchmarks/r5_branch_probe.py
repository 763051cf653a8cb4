"""How much do the giga kernel's per-tile branches cost?

Same 1180-tile auto-pipelined int8 stream as the giga kernel (tps=2,
scale rows streamed alongside), with three bodies:

  plain   — convert + matmul + scale only (the floor at this grid length)
  branchy — plus the giga kernel's ~10 pl.when predicates per tile with
            trivial bodies (isolates predicate/region cost)
  branchy-stores — predicates with real scratch stores (adds VPU writes)

Usage: python benchmarks/r5_branch_probe.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import benchmarks  # noqa: F401

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BK, BN, NT, TPS = 2048, 512, 1180, 2
B = 8
N_QKV, TPL, HEAD_BASE = 6, 58, 928
N_WO, N_GU, N_DOWN = 4, 32, 16


def make_kernel(mode):
    def kern(lens_ref, x_ref, w_ref, s_ref, k_hbm, v_hbm, log_hbm,
             o_ref, acc_ref, g_scr,
             q_scr, h16_scr, dn_scr, lg_scr, lgsem, bv_scr, bi_scr,
             qkv_scr, att_scr2, m_scr, l_scr, a_scr, kbuf, vbuf,
             x1_scr, xres_scr, xn_scr2, gmf_scr,
             ksem, vsem, wrsem, *rowbufs):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            h16_scr[...] = jnp.zeros_like(h16_scr)
            qkv_scr[...] = jnp.zeros_like(qkv_scr)
            x1_scr[...] = jnp.zeros_like(x1_scr)

            xres_scr[...] = x_ref[...].astype(jnp.float32)
            xn_scr2[...] = x_ref[...]
            gmf_scr[...] = jnp.ones_like(gmf_scr)
            att_scr2[...] = jnp.zeros_like(att_scr2)
            if mode in ("attention-like", "combined2"):
                for blk in range(2):
                    pltpu.make_async_copy(
                        k_hbm.at[0, :, pl.ds(blk * 128, 128)], kbuf.at[blk],
                        ksem.at[blk]).start()
                    pltpu.make_async_copy(
                        v_hbm.at[0, :, pl.ds(blk * 128, 128)], vbuf.at[blk],
                        vsem.at[blk]).start()
            dn_scr[...] = jnp.zeros_like(dn_scr)
            bv_scr[...] = jnp.full(bv_scr.shape, -jnp.inf, jnp.float32)
            bi_scr[...] = jnp.zeros(bi_scr.shape, jnp.int32)

        for i in range(TPS):
            tt = t * TPS + i
            w = w_ref[i].astype(jnp.bfloat16)
            s = s_ref[i, 0]
            p = jax.lax.dot(x_ref[...], w,
                            preferred_element_type=jnp.float32) * s[None, :]
            if mode == "plain":
                acc_ref[...] += p[:1, :]
                continue

            tl = tt - N_QKV
            l = jax.lax.div(tl, TPL)
            j = tl - l * TPL
            ht = tt - HEAD_BASE
            in_qkv0 = tt < N_QKV
            in_layers = (tt >= N_QKV) & (tt < HEAD_BASE)
            in_head = tt >= HEAD_BASE
            last_down = N_WO + N_GU + N_DOWN - 1

            if mode == "branchy":
                @pl.when(in_qkv0)
                def _(p=p):
                    acc_ref[...] += p[:1, :]

                @pl.when(in_layers & (j == 0))
                def _(p=p):
                    acc_ref[...] += p[:1, :] * 2.0

                @pl.when(in_layers & (j < N_WO))
                def _(p=p):
                    acc_ref[...] += p[:1, :] * 3.0

                @pl.when(in_layers & (j >= N_WO) & (j < N_WO + N_GU))
                def _(p=p):
                    acc_ref[...] += p[:1, :] * 4.0

                @pl.when(in_layers & (j >= N_WO + N_GU) & (j <= last_down))
                def _(p=p):
                    acc_ref[...] += p[:1, :] * 5.0

                @pl.when(in_layers & (j > last_down))
                def _(p=p):
                    acc_ref[...] += p[:1, :] * 6.0

                @pl.when(in_head & (ht == 0))
                def _(p=p):
                    acc_ref[...] += p[:1, :] * 7.0

                @pl.when(in_head)
                def _(p=p):
                    acc_ref[...] += p[:1, :] * 8.0
            elif mode == "down-like":
                # every 'down' tile: dynamic first-dim h_scr reads + concat
                # -> [B, BK] operand + dn acc read-modify-write
                in_down = in_layers & (j >= N_WO + N_GU) & (j <= last_down)

                @pl.when(in_down)
                def _(p=p, j=j):
                    jd = j - N_WO - N_GU
                    kk = jd // 4
                    nn = jd % 4
                    xk = jnp.concatenate(
                        [h16_scr[kk * 4 + c] for c in range(4)], axis=1)
                    p2 = jax.lax.dot(
                        xk, w, preferred_element_type=jnp.float32
                    ) * s[None, :]
                    dn_scr[nn] = dn_scr[nn] + p2

                @pl.when(~in_down)
                def _(p=p):
                    acc_ref[...] += p[:1, :]

            elif mode in ("attention-like", "combined2"):
                @pl.when(in_layers & (j == 0))
                def _(l=l):
                    for b in range(B):
                        st = (jnp.minimum(lens_ref[b], 512 - 1) // 8) * 8
                        pltpu.make_async_copy(
                            k_hbm.at[l, b, pl.ds(st, 8)], rowbufs[b],
                            wrsem).start()
                        pltpu.make_async_copy(
                            v_hbm.at[l, b, pl.ds(st, 8)],
                            rowbufs[B + b], wrsem).start()
                    q_rows = jnp.concatenate(
                        [qkv_scr[c] for c in range(4)], axis=1)
                    kn = qkv_scr[4] * 1.0
                    vn = qkv_scr[5]
                    lane_nq = jax.lax.broadcasted_iota(
                        jnp.int32, (32, 2048), 1)
                    row_nq = jax.lax.broadcasted_iota(
                        jnp.int32, (32, 2048), 0)
                    sel = ((lane_nq >= row_nq * 64)
                           & (lane_nq < (row_nq + 1) * 64))
                    ones_col = jnp.ones((32, 1), jnp.bfloat16)
                    q_pk = []
                    for b in range(B):
                        bc = jax.lax.dot(
                            ones_col,
                            q_rows[b:b + 1].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                        m = jnp.where(sel, bc, 0.0)
                        packed = None
                        for c in range(4):
                            part = m[:, c * 512:(c + 1) * 512]
                            packed = part if packed is None else packed + part
                        q_pk.append(packed.astype(jnp.bfloat16))
                    for b in range(B):
                        st = (jnp.minimum(lens_ref[b], 511) // 8) * 8
                        pltpu.make_async_copy(
                            k_hbm.at[l, b, pl.ds(st, 8)], rowbufs[b],
                            wrsem).wait()
                        pltpu.make_async_copy(
                            v_hbm.at[l, b, pl.ds(st, 8)], rowbufs[B + b],
                            wrsem).wait()
                    rowid = jax.lax.broadcasted_iota(jnp.int32, (8, 512), 0)
                    for b in range(B):
                        r = lens_ref[b] - (jnp.minimum(lens_ref[b], 511)
                                           // 8) * 8
                        k8 = jnp.where(rowid == r,
                                       jnp.broadcast_to(kn[b:b + 1],
                                                        (8, 512)),
                                       rowbufs[b][...].astype(jnp.float32))
                        rowbufs[b][...] = k8.astype(jnp.bfloat16)
                    for b in range(B):
                        st = (jnp.minimum(lens_ref[b], 511) // 8) * 8
                        pltpu.make_async_copy(
                            rowbufs[b], k_hbm.at[l, b, pl.ds(st, 8)],
                            wrsem).start()
                    maxlen = lens_ref[0]
                    for b in range(1, B):
                        maxlen = jnp.maximum(maxlen, lens_ref[b])
                    m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
                    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
                    a_scr[...] = jnp.zeros(a_scr.shape, jnp.float32)
                    col_t = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)
                    for blk in range(4):
                        @pl.when(blk * 128 < maxlen)
                        def _(blk=blk):
                            slot = blk % 2
                            pltpu.make_async_copy(
                                k_hbm.at[l, :, pl.ds(blk * 128, 128)],
                                kbuf.at[slot], ksem.at[slot]).wait()
                            pltpu.make_async_copy(
                                v_hbm.at[l, :, pl.ds(blk * 128, 128)],
                                vbuf.at[slot], vsem.at[slot]).wait()
                            for b in range(B):
                                sc2 = jax.lax.dot_general(
                                    q_pk[b],
                                    kbuf[slot, b].astype(jnp.bfloat16),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                                sc2 = jnp.where(
                                    col_t + blk * 128 < lens_ref[b], sc2,
                                    -1e37)
                                m_prev = m_scr[b]
                                m_next = jnp.maximum(
                                    m_prev, sc2.max(axis=1, keepdims=True))
                                alpha = jnp.exp(m_prev - m_next)
                                pp = jnp.exp(sc2 - m_next)
                                l_scr[b] = alpha * l_scr[b] + jnp.sum(
                                    pp, axis=1, keepdims=True)
                                m_scr[b] = m_next
                                pv = jax.lax.dot(
                                    pp.astype(jnp.bfloat16),
                                    vbuf[slot, b].astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
                                a_scr[b] = a_scr[b] * alpha + pv
                            if blk + 2 < 4:
                                @pl.when((blk + 2) * 128 < maxlen)
                                def _():
                                    pltpu.make_async_copy(
                                        k_hbm.at[l, :,
                                                 pl.ds((blk + 2) * 128,
                                                       128)],
                                        kbuf.at[slot],
                                        ksem.at[slot]).start()
                                    pltpu.make_async_copy(
                                        v_hbm.at[l, :,
                                                 pl.ds((blk + 2) * 128,
                                                       128)],
                                        vbuf.at[slot],
                                        vsem.at[slot]).start()
                    lane_hd = jax.lax.broadcasted_iota(
                        jnp.int32, (32, 2048), 1)
                    row_hd = jax.lax.broadcasted_iota(
                        jnp.int32, (32, 2048), 0)
                    sel2 = ((lane_hd >= row_hd * 64)
                            & (lane_hd < (row_hd + 1) * 64))
                    ones_row = jnp.ones((1, 32), jnp.float32)
                    slot_kv = jax.lax.broadcasted_iota(
                        jnp.int32, (32, 1), 0) % 8
                    for b in range(B):
                        s_cur = jnp.sum(
                            q_pk[b].astype(jnp.float32) * kn[b:b + 1],
                            axis=1, keepdims=True)
                        m_fin = jnp.maximum(m_scr[b], s_cur)
                        alpha = jnp.exp(m_scr[b] - m_fin)
                        p_cur = jnp.exp(s_cur - m_fin)
                        lsum = l_scr[b] * alpha + p_cur
                        acc = a_scr[b] * alpha + p_cur * vn[b:b + 1]
                        acc = acc / jnp.where(lsum == 0.0, 1.0, lsum)
                        att = None
                        for jj in range(8):
                            part = (acc[:, jj * 64:(jj + 1) * 64]
                                    * (slot_kv == jj))
                            att = part if att is None else att + part
                        tiled = jnp.concatenate([att] * 32, axis=1)
                        mt = jnp.where(sel2, tiled, 0.0)
                        att_scr2[b:b + 1] = jax.lax.dot(
                            ones_row, mt,
                            preferred_element_type=jnp.float32
                        ).astype(att_scr2.dtype)

                    @pl.when(l + 1 < 16)
                    def _():
                        for blk in range(2):
                            @pl.when(blk * 128 < maxlen)
                            def _(blk=blk):
                                pltpu.make_async_copy(
                                    k_hbm.at[l + 1, :,
                                             pl.ds(blk * 128, 128)],
                                    kbuf.at[blk], ksem.at[blk]).start()
                                pltpu.make_async_copy(
                                    v_hbm.at[l + 1, :,
                                             pl.ds(blk * 128, 128)],
                                    vbuf.at[blk], vsem.at[blk]).start()
                    for b in range(B):
                        st = (jnp.minimum(lens_ref[b], 511) // 8) * 8
                        pltpu.make_async_copy(
                            rowbufs[b], k_hbm.at[l, b, pl.ds(st, 8)],
                            wrsem).wait()

                acc_ref[...] += p[:1, :]

            elif mode == "combined":
                # real wo body
                @pl.when(in_layers & (j < N_WO))
                def _(p=p, j=j, w=w, s=s):
                    att = att_scr2[...]
                    p2 = jax.lax.dot(att, w,
                                     preferred_element_type=jnp.float32)
                    xc = xres_scr[:, :BN]
                    for c in range(1, N_WO):
                        xc = jnp.where(j == c,
                                       xres_scr[:, c * BN:(c + 1) * BN], xc)
                    x1_scr[j] = p2 * s[None, :] + xc

                    @pl.when(j == N_WO - 1)
                    def _():
                        x1 = jnp.concatenate(
                            [x1_scr[c] for c in range(N_WO)], axis=1)
                        rstd = jax.lax.rsqrt(
                            jnp.mean(jnp.square(x1), axis=-1,
                                     keepdims=True) + 1e-5)
                        xn_scr2[...] = (x1 * rstd * gmf_scr[0][None, :]
                                        ).astype(jnp.bfloat16)

                @pl.when(in_layers & (j >= N_WO) & (j < N_WO + N_GU))
                def _(p=p, j=j, w=w, s=s):
                    jg = j - N_WO
                    p2 = (jax.lax.dot(xn_scr2[...], w,
                                      preferred_element_type=jnp.float32)
                          * s[None, :])

                    @pl.when(jg % 2 == 0)
                    def _():
                        g_scr[...] = p2

                    @pl.when(jg % 2 == 1)
                    def _():
                        g = g_scr[...]
                        h16_scr[jg // 2] = (g * jax.nn.sigmoid(g) * p2
                                            ).astype(jnp.bfloat16)

                in_down = in_layers & (j >= N_WO + N_GU) & (j <= last_down)

                @pl.when(in_down)
                def _(p=p, j=j, w=w, s=s):
                    jd = j - N_WO - N_GU
                    kk = jd // 4
                    nn = jd % 4
                    xk = jnp.concatenate(
                        [h16_scr[kk * 4 + c] for c in range(4)], axis=1)
                    p2 = jax.lax.dot(
                        xk, w, preferred_element_type=jnp.float32
                    ) * s[None, :]

                    @pl.when(kk == 0)
                    def _():
                        dn_scr[nn] = p2

                    @pl.when(kk > 0)
                    def _():
                        dn_scr[nn] = dn_scr[nn] + p2

                    @pl.when(jd == N_DOWN - 1)
                    def _():
                        x1 = jnp.concatenate(
                            [x1_scr[c] for c in range(N_WO)], axis=1)
                        out = jnp.concatenate(
                            [dn_scr[c] for c in range(4)], axis=1)
                        x_out = out + x1
                        xres_scr[...] = x_out
                        rstd = jax.lax.rsqrt(
                            jnp.mean(jnp.square(x_out), axis=-1,
                                     keepdims=True) + 1e-5)
                        xn_scr2[...] = (x_out * rstd * gmf_scr[0][None, :]
                                        ).astype(jnp.bfloat16)

                @pl.when(in_layers & (j > last_down))
                def _(p=p, j=j, w=w, s=s):
                    nn = j - last_down - 1
                    p2 = jax.lax.dot(xn_scr2[...], w,
                                     preferred_element_type=jnp.float32)
                    qkv_scr[nn] = p2 * s[None, :]

                @pl.when(in_head)
                def _(p=p, ht=ht, w=w, s=s):
                    p2 = (jax.lax.dot(xn_scr2[...], w,
                                      preferred_element_type=jnp.float32)
                          * s[None, :])
                    slot = jax.lax.rem(ht, 2)

                    def lg_copy(step, sl):
                        return pltpu.make_async_copy(
                            lg_scr.at[sl],
                            log_hbm.at[:, pl.ds(step * BN, BN)],
                            lgsem.at[sl])

                    @pl.when(ht >= 2)
                    def _():
                        lg_copy(ht - 2, slot).wait()

                    lg_scr[slot] = p2.astype(jnp.bfloat16)
                    lg_copy(ht, slot).start()
                    col = jax.lax.broadcasted_iota(jnp.int32, p2.shape, 1)                         + ht * BN
                    logits = jnp.where(col < 128256, p2, -jnp.inf)
                    val = jnp.max(logits, axis=1, keepdims=True)
                    idx = (jnp.argmax(logits, axis=1).astype(jnp.int32)
                           [:, None] + ht * BN)
                    better = val > bv_scr[...]
                    bv_scr[...] = jnp.where(better, val, bv_scr[...])
                    bi_scr[...] = jnp.where(better, idx, bi_scr[...])

                    @pl.when(ht == NT - HEAD_BASE - 1)
                    def _():
                        lg_copy(ht, slot).wait()
                        lg_copy(ht - 1, 1 - slot).wait()

            elif mode == "head-like":
                @pl.when(in_head)
                def _(p=p, ht=ht):
                    slot = jax.lax.rem(ht, 2)

                    def lg_copy(step, sl):
                        return pltpu.make_async_copy(
                            lg_scr.at[sl],
                            log_hbm.at[:, pl.ds(step * BN, BN)],
                            lgsem.at[sl])

                    @pl.when(ht >= 2)
                    def _():
                        lg_copy(ht - 2, slot).wait()

                    lg_scr[slot] = p.astype(jnp.bfloat16)
                    lg_copy(ht, slot).start()
                    col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)                         + ht * BN
                    logits = jnp.where(col < 128256, p, -jnp.inf)
                    val = jnp.max(logits, axis=1, keepdims=True)
                    idx = (jnp.argmax(logits, axis=1).astype(jnp.int32)
                           [:, None] + ht * BN)
                    better = val > bv_scr[...]
                    bv_scr[...] = jnp.where(better, val, bv_scr[...])
                    bi_scr[...] = jnp.where(better, idx, bi_scr[...])

                    @pl.when(ht == NT - HEAD_BASE - 1)
                    def _():
                        lg_copy(ht, slot).wait()
                        lg_copy(ht - 1, 1 - slot).wait()

                @pl.when(~in_head)
                def _(p=p):
                    acc_ref[...] += p[:1, :]

            else:  # branchy-stores
                @pl.when(in_layers & (j >= N_WO) & (j < N_WO + N_GU))
                def _(p=p, j=j):
                    jg = j - N_WO

                    @pl.when(jg % 2 == 0)
                    def _():
                        g_scr[...] = p

                    @pl.when(jg % 2 == 1)
                    def _():
                        g = g_scr[...]
                        q_scr[...] = (g * jax.nn.sigmoid(g) * p).astype(
                            jnp.bfloat16)

                @pl.when(in_head | in_qkv0 | (in_layers & (j < N_WO))
                         | (in_layers & (j > last_down))
                         | (in_layers & (j >= N_WO + N_GU)
                            & (j <= last_down)))
                def _(p=p):
                    acc_ref[...] += p[:1, :]

        @pl.when(t == NT // TPS - 1)
        def _():
            o_ref[...] = (acc_ref[...] + q_scr[:1, :].astype(jnp.float32)
                          + bv_scr[:1, :].astype(jnp.float32))

    return kern


def main():
    key = jax.random.key(0)
    w = jax.random.randint(key, (NT, BK, BN), -127, 128, jnp.int8)
    sc = jax.random.uniform(jax.random.fold_in(key, 3), (NT, 1, BN),
                            jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, BK), jnp.bfloat16)
    kpool = jax.random.normal(jax.random.fold_in(key, 5),
                              (16, B, 512, BN), jnp.bfloat16)
    vpool = jax.random.normal(jax.random.fold_in(key, 6),
                              (16, B, 512, BN), jnp.bfloat16)
    lens = jnp.array([192 + 7 * i for i in range(B)], jnp.int32)

    import sys as _sys
    modes = (_sys.argv[1:] if len(_sys.argv) > 1
             else ["plain", "branchy", "branchy-stores", "down-like",
                   "head-like", "attention-like", "combined"])
    for mode in modes:
        f = pl.pallas_call(
            make_kernel(mode),
            grid_spec=pltpu.PrefetchScalarGridSpec(
              num_scalar_prefetch=1,
              grid=(NT // TPS,),
              in_specs=[
                pl.BlockSpec((B, BK), lambda t, *_: (0, 0)),
                pl.BlockSpec((TPS, BK, BN), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((TPS, 1, BN), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
              ],
              out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                         pl.BlockSpec((1, BN), lambda t, *_: (0, 0))),
              scratch_shapes=[
                pltpu.VMEM((1, BN), jnp.float32),
                pltpu.VMEM((B, BN), jnp.float32),
                pltpu.VMEM((B, BN), jnp.bfloat16),
                pltpu.VMEM((16, B, BN), jnp.bfloat16),
                pltpu.VMEM((4, B, BN), jnp.float32),
                pltpu.VMEM((2, B, BN), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((B, 1), jnp.float32),
                pltpu.VMEM((B, 1), jnp.int32),
                pltpu.VMEM((6, B, BN), jnp.float32),
                pltpu.VMEM((B, 2048), jnp.bfloat16),
                pltpu.VMEM((B, 32, 1), jnp.float32),
                pltpu.VMEM((B, 32, 1), jnp.float32),
                pltpu.VMEM((B, 32, BN), jnp.float32),
                pltpu.VMEM((2, B, 128, BN), jnp.bfloat16),
                pltpu.VMEM((2, B, 128, BN), jnp.bfloat16),
                pltpu.VMEM((N_WO, B, BN), jnp.float32),
                pltpu.VMEM((B, BK), jnp.float32),
                pltpu.VMEM((B, BK), jnp.bfloat16),
                pltpu.VMEM((1, BK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
                *[pltpu.VMEM((8, BN), jnp.bfloat16) for _ in range(2 * B)],
              ],
            ),
            out_shape=(jax.ShapeDtypeStruct((B, (NT - HEAD_BASE) * BN),
                                            jnp.bfloat16),
                       jax.ShapeDtypeStruct((1, BN), jnp.float32)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )

        @jax.jit
        def chain(n, x, w, sc):
            def body(_, c):
                x = c
                _lg, out = f(lens, x, w, sc, kpool, vpool)
                return x + (out[0, 0] * 1e-20).astype(x.dtype)

            x = jax.lax.fori_loop(0, n, body, x)
            return x[0, 0].astype(jnp.float32)

        float(chain(jnp.int32(2), x, w, sc))

        def run(n):
            t0 = time.perf_counter()
            float(chain(jnp.int32(n), x, w, sc))
            return time.perf_counter() - t0

        run(16)
        t1 = min(run(16) for _ in range(3))
        t2 = min(run(32) for _ in range(3))
        per = (t2 - t1) / 16
        print(f"{mode:15s}: {per*1e3:7.3f} ms / {NT} tiles "
              f"({per/NT*1e6:5.2f} us/tile, {w.nbytes/per/1e9:6.1f} GB/s)")


if __name__ == "__main__":
    main()
