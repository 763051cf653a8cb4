"""Single-kernel decode layer: [in-kernel GQA attention over the dense KV
cache + RoPE + cache write-back] -> [wo(+res) -> RMSNorm -> SwiGLU ->
down(+res) -> next layer's RMSNorm+wqkv] as ONE unrolled Pallas call.

Why one kernel: on v5e each kernel launch costs ~10us and every kernel
boundary idles the DMA engine for the neighbor kernel's duration; with two
kernels per layer the decode floor measured ~116us/layer against a ~75us
weight-stream bound (benchmarks/r4_layer.py). Putting attention INSIDE the
weight-stream kernel hides its DMAs and compute under the stream: the
weight ring starts in the prologue, attention runs while the first tiles
arrive, and the wo segment consumes the attention output directly from
VMEM.

The blocker was Mosaic's relayout rules: [NH, HD] attention output cannot
reshape to the [B, NQ] matmul operand in-kernel, and a [1, NQ] qkv row
cannot reshape to the [NH, KD] lane-packed query matrix. Both are solved
on the MXU (benchmarks/r4_probe.py):

  unpack:  bcast = ones[NH,1] @ q_row[1,NQ]; mask to the per-slot lane
           window; fold NQ->KD by summing G chunks.
  flatten: tiled = lane-tile(att[NH,HD] -> [NH,NQ]); mask; ones[1,NH] @ .

The fold places slot n's vector at lanes (n mod NKV)*HD, so the kernel
uses the SLOT head order h(n) = (n mod NKV)*G + n//NKV: wq's columns and
wo's rows are permuted to slot order at pack time (pure data layout; the
k/v projections and caches are untouched). kv(slot n) = n mod NKV.

Parity anchor: the reference caches one cuBLASLt plan per Linear with
fused epilogues (CudaLinearOp.ixx:147-225); the TPU-native equivalent is
one resident plan for the ENTIRE decoder layer.

Inference-only (no VJP).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mila_tpu.inference.quantize import QTensor
from mila_tpu.kernels.layer_fused import pack_layer
from mila_tpu.kernels.quant_matmul import _load_w

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def slot_order(nh: int, nkv: int) -> np.ndarray:
    """slot n -> original head (n % NKV)*G + n // NKV (kv(slot) = n % NKV)."""
    g = nh // nkv
    return np.array([(n % nkv) * g + n // nkv for n in range(nh)], np.int64)


def permute_q_columns(wqkv: QTensor, nh: int, nkv: int, hd: int) -> QTensor:
    """Permute the first NH*HD output columns of a fused wqkv QTensor into
    slot order (pack-time; k/v columns untouched)."""
    nq = nh * hd
    slots = slot_order(nh, nkv)
    cols = np.concatenate(
        [np.arange(h * hd, (h + 1) * hd) for h in slots]
    )
    full = np.concatenate([cols, np.arange(nq, wqkv.q.shape[1])])
    return QTensor(wqkv.q[:, full], wqkv.scale[:, full], wqkv.block_size,
                   wqkv.packed_rows)


def permute_wo_rows(wo: QTensor, nh: int, nkv: int, hd: int) -> Optional[QTensor]:
    """Permute wo's input rows into slot order. Requires full-axis scale
    blocks (row permutation would mix scale blocks otherwise)."""
    if wo.block_size != wo.q.shape[0]:
        return None
    slots = slot_order(nh, nkv)
    rows = np.concatenate(
        [np.arange(h * hd, (h + 1) * hd) for h in slots]
    )
    return QTensor(wo.q[rows, :], wo.scale, wo.block_size, wo.packed_rows)


class MegaPack(NamedTuple):
    """Weights of one decode layer for the single-kernel path: the
    layer_fused tile stream built from SLOT-permuted wo (+ the NEXT
    layer's slot-permuted wqkv)."""

    w: jax.Array  # [T, bk, bn]
    s: jax.Array  # [T, 1, bn] f32
    h_dim: int
    i_dim: int
    bn: int
    n_wo: int
    n_gu: int
    n_down: int
    n_qkv: int


jax.tree_util.register_pytree_node(
    MegaPack,
    lambda t: ((t.w, t.s), tuple(t[2:])),
    lambda aux, leaves: MegaPack(*leaves, *aux),
)


def pack_mega_layer(wo, wgu, down, wqkv_next, *, nh: int, nkv: int, hd: int,
                    bn: int = 512) -> Optional[MegaPack]:
    wo_p = permute_wo_rows(wo, nh, nkv, hd)
    if wo_p is None:
        return None
    wqkv_p = (permute_q_columns(wqkv_next, nh, nkv, hd)
              if wqkv_next is not None else None)
    lp = pack_layer(wo_p, wgu, down, wqkv_p, bn=bn)
    if lp is None:
        return None
    return MegaPack(w=lp.w, s=lp.s, h_dim=lp.h_dim, i_dim=lp.i_dim,
                    bn=lp.bn, n_wo=lp.n_wo, n_gu=lp.n_gu,
                    n_down=lp.n_down, n_qkv=lp.n_qkv)


def _mega_kernel(
    lens_ref,  # SMEM [B] int32: OLD cache rows per sequence
    qkv_ref,  # [B, NQ+2KD] VMEM: raw fused projection row (q in SLOT order,
    #           pre-rope)
    x_ref,  # [B, H] VMEM residual stream
    gm_mlp_ref,  # [1, H] f32
    gm_nxt_ref,  # [1, H] f32
    cos_ref,  # [B, KD] f32 full-width tiled
    sin_ref,  # [B, KD] f32 pre-signed
    s_ref,  # [T_tiles, 1, bn] f32 VMEM-resident scale rows
    w_hbm,  # [T_tiles, bk, bn] ANY
    k_hbm,  # [B, T, KD] ANY (aliased to k_out)
    v_hbm,
    o_ref,  # [B, H] x_out
    qkv_out,  # [B, max(Nq, 128)]
    ko_ref,  # aliased pass-through + RMW row write-back
    vo_ref,
    *,
    n_wo: int,
    n_gu: int,
    n_down: int,
    n_qkv: int,
    bn: int,
    H: int,
    eps: float,
    depth: int,
    batch: int,
    nkv: int,
    group: int,
    hd: int,
    T: int,
    bt: int,
    sm_scale: float,
):
    nh = nkv * group
    kd = nkv * hd
    nq = nh * hd
    n_tiles = n_wo + n_gu + n_down + n_qkv
    n_cols = H // bn
    cpb = H // bn
    n_blocks = T // bt

    def body(wbuf, wsem, kbuf, vbuf, kvsem, wrsem, att_scr, rowk, rowv):
        def wcopy(slot, idx):
            return pltpu.make_async_copy(w_hbm.at[idx], wbuf.at[slot],
                                         wsem.at[slot])

        maxlen = lens_ref[0]
        for b in range(1, batch):
            maxlen = jnp.maximum(maxlen, lens_ref[b])

        # ---- prologue: weight ring + KV slabs + RMW row reads ----
        for d in range(min(depth, n_tiles)):
            wcopy(d, d).start()
        kv_copies = []
        for blk in range(n_blocks):
            ck = pltpu.make_async_copy(
                k_hbm.at[:, pl.ds(blk * bt, bt)],
                kbuf.at[:, pl.ds(blk * bt, bt)], kvsem)
            cv = pltpu.make_async_copy(
                v_hbm.at[:, pl.ds(blk * bt, bt)],
                vbuf.at[:, pl.ds(blk * bt, bt)], kvsem)
            kv_copies.append((blk, ck, cv))
        for blk, ck, cv in kv_copies:
            @pl.when(blk * bt < maxlen)
            def _(ck=ck, cv=cv):
                ck.start()
                cv.start()

        def rd_blk(b):
            # Clamped to the last full block: at lens[b] == T the RMW
            # degenerates to rewriting the final 8 rows unchanged (rowid
            # never equals 8) instead of an OOB HBM DMA (ADVICE r4 #2).
            # Clamp BEFORE the //8*8 alignment: Mosaic's divisibility
            # analysis proves x//8*8 but not min(x*8, c).
            return (jnp.minimum(lens_ref[b], T - 1) // 8) * 8

        row_rw = []
        for b in range(batch):
            st = rd_blk(b)
            row_rw.append((
                pltpu.make_async_copy(ko_ref.at[b, pl.ds(st, 8)],
                                      rowk[b], wrsem),
                pltpu.make_async_copy(vo_ref.at[b, pl.ds(st, 8)],
                                      rowv[b], wrsem),
            ))
        for ck, cv in row_rw:
            ck.start()
            cv.start()

        # ---- q unpack (slot order) + rope; k_new rope ----
        def rope(xv, c, s):
            lo = jnp.roll(xv, -(hd // 2), axis=1)
            hi = jnp.roll(xv, hd // 2, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, xv.shape, 1)
            y = jnp.where(lane % hd < hd // 2, lo, hi)
            return xv * c + y * s

        lane_nq = jax.lax.broadcasted_iota(jnp.int32, (nh, nq), 1)
        row_nq = jax.lax.broadcasted_iota(jnp.int32, (nh, nq), 0)
        sel = (lane_nq >= row_nq * hd) & (lane_nq < (row_nq + 1) * hd)
        ones_col = jnp.ones((nh, 1), jnp.bfloat16)
        q_pk = []
        for b in range(batch):
            q_row = qkv_ref[b : b + 1, :nq].astype(jnp.bfloat16)
            bc = jax.lax.dot(ones_col, q_row,
                             preferred_element_type=jnp.float32)
            m = jnp.where(sel, bc, 0.0)
            packed = None
            for c in range(nq // kd):
                part = m[:, c * kd : (c + 1) * kd]
                packed = part if packed is None else packed + part
            q_pk.append(
                rope(packed, cos_ref[b][None, :], sin_ref[b][None, :])
                .astype(jnp.bfloat16)
            )
        kn = rope(qkv_ref[:, nq : nq + kd].astype(jnp.float32),
                  cos_ref[...], sin_ref[...])
        vn = qkv_ref[:, nq + kd : nq + 2 * kd].astype(jnp.float32)

        # ---- RMW insert of the new rows (overlaps everything below) ----
        for ck, cv in row_rw:
            ck.wait()
            cv.wait()
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
        wr_copies = []
        for b in range(batch):
            st = rd_blk(b)
            wr_copies.append((
                pltpu.make_async_copy(rowk[b], ko_ref.at[b, pl.ds(st, 8)],
                                      wrsem),
                pltpu.make_async_copy(rowv[b], vo_ref.at[b, pl.ds(st, 8)],
                                      wrsem),
            ))
        for ck, cv in wr_copies:
            ck.start()
            cv.start()

        # ---- attention (single pass over the VMEM-resident live KV) ----
        # Blocks past maxlen were never DMAd: zero their vbuf slabs so the
        # pv contraction sees 0 instead of stale VMEM (0 * NaN would poison
        # the MXU accumulation — ADVICE r4 #1). kbuf garbage is harmless:
        # its scores are replaced via jnp.where before the exp.
        for blk, ck, cv in kv_copies:
            @pl.when(blk * bt < maxlen)
            def _(ck=ck, cv=cv):
                ck.wait()
                cv.wait()

            @pl.when(blk * bt >= maxlen)
            def _(blk=blk):
                vbuf[:, pl.ds(blk * bt, bt)] = jnp.zeros(
                    (batch, bt, kd), vbuf.dtype)

        lane_t = jax.lax.broadcasted_iota(jnp.int32, (nh, T), 1)
        lane_hd = jax.lax.broadcasted_iota(jnp.int32, (nh, nq), 1)
        row_hd = jax.lax.broadcasted_iota(jnp.int32, (nh, nq), 0)
        sel2 = (lane_hd >= row_hd * hd) & (lane_hd < (row_hd + 1) * hd)
        ones_row = jnp.ones((1, nh), jnp.float32)
        slot_kv = jax.lax.broadcasted_iota(jnp.int32, (nh, 1), 0) % nkv
        att_rows = []
        for b in range(batch):
            length = lens_ref[b]
            s_all = jax.lax.dot_general(
                q_pk[b], kbuf[b].astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [NH, T]
            s_all = jnp.where(lane_t < length, s_all, MASK_VALUE)
            # current token joins in-register
            s_cur = jnp.sum(
                q_pk[b].astype(jnp.float32) * kn[b : b + 1], axis=1,
                keepdims=True,
            ) * sm_scale  # [NH, 1]
            m_all = jnp.maximum(jnp.max(s_all, axis=1, keepdims=True), s_cur)
            p = jnp.exp(s_all - m_all)
            p_cur = jnp.exp(s_cur - m_all)
            l = jnp.sum(p, axis=1, keepdims=True) + p_cur
            pv = jax.lax.dot(
                p.astype(jnp.bfloat16), vbuf[b].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) + p_cur * vn[b : b + 1]  # [NH, KD]
            acc = pv / jnp.where(l == 0.0, 1.0, l)
            # lane-select per slot (kv = slot % NKV) -> [NH, HD]
            att = None
            for j in range(nkv):
                part = acc[:, j * hd : (j + 1) * hd] * (slot_kv == j)
                att = part if att is None else att + part
            # flatten [NH, HD] -> [1, NQ] (slot order matches wo rows)
            tiled = jnp.concatenate([att] * (nq // hd), axis=1)
            mt = jnp.where(sel2, tiled, 0.0)
            att_rows.append(jax.lax.dot(
                ones_row, mt, preferred_element_type=jnp.float32))
        att_flat = jnp.concatenate(att_rows, axis=0).astype(jnp.bfloat16)

        # ---- layer tail over the weight stream ----
        gm = gm_mlp_ref[0]
        x1_chunks, h_chunks, qkv_chunks = [], [], []
        x1 = xn = g_val = x_out = xq = None
        acc_c = [None] * n_cols
        for t in range(n_tiles):
            slot = t % depth
            wcopy(slot, t).wait()
            w = _load_w(wbuf[slot])
            s = s_ref[t, 0]
            if t < n_wo:
                p = jax.lax.dot(att_flat, w,
                                preferred_element_type=jnp.float32)
                x1_chunks.append(
                    p * s[None, :]
                    + x_ref[:, t * bn : (t + 1) * bn].astype(jnp.float32)
                )
                if t == n_wo - 1:
                    x1 = (x1_chunks[0] if n_wo == 1
                          else jnp.concatenate(x1_chunks, axis=1))
                    rstd = jax.lax.rsqrt(
                        jnp.mean(jnp.square(x1), axis=-1, keepdims=True)
                        + eps)
                    xn = (x1 * rstd * gm[None, :]).astype(jnp.bfloat16)
            elif t < n_wo + n_gu:
                j = t - n_wo
                p = (jax.lax.dot(xn, w, preferred_element_type=jnp.float32)
                     * s[None, :])
                if j % 2 == 0:
                    g_val = p
                else:
                    h_chunks.append(
                        (g_val * jax.nn.sigmoid(g_val) * p).astype(
                            jnp.bfloat16))
            elif t < n_wo + n_gu + n_down:
                jd = t - n_wo - n_gu
                k_i, n_i = divmod(jd, n_cols)
                hk = h_chunks[k_i * cpb : (k_i + 1) * cpb]
                xk = hk[0] if cpb == 1 else jnp.concatenate(hk, axis=1)
                p = (jax.lax.dot(xk, w, preferred_element_type=jnp.float32)
                     * s[None, :])
                acc_c[n_i] = p if acc_c[n_i] is None else acc_c[n_i] + p
                if jd == n_down - 1:
                    out = (acc_c[0] if n_cols == 1
                           else jnp.concatenate(acc_c, axis=1))
                    x_out = out + x1
                    o_ref[...] = x_out.astype(o_ref.dtype)
                    if n_qkv:
                        rstd = jax.lax.rsqrt(
                            jnp.mean(jnp.square(x_out), axis=-1,
                                     keepdims=True) + eps)
                        xq = (x_out * rstd
                              * gm_nxt_ref[0][None, :]).astype(jnp.bfloat16)
            else:
                p = (jax.lax.dot(xq, w, preferred_element_type=jnp.float32)
                     * s[None, :])
                qkv_chunks.append(p.astype(qkv_out.dtype))
            if t + depth < n_tiles:
                wcopy(slot, t + depth).start()

        if n_qkv:
            qkv_out[...] = (qkv_chunks[0] if n_qkv == 1
                            else jnp.concatenate(qkv_chunks, axis=1))
        else:
            qkv_out[...] = jnp.zeros_like(qkv_out)
        for ck, cv in wr_copies:
            ck.wait()
            cv.wait()

    B = batch
    KD = kd
    pl.run_scoped(
        body,
        wbuf=pltpu.VMEM((depth, w_hbm.shape[1], bn), w_hbm.dtype),
        wsem=pltpu.SemaphoreType.DMA((depth,)),
        kbuf=pltpu.VMEM((B, T, KD), k_hbm.dtype),
        vbuf=pltpu.VMEM((B, T, KD), v_hbm.dtype),
        kvsem=pltpu.SemaphoreType.DMA,
        wrsem=pltpu.SemaphoreType.DMA,
        att_scr=pltpu.VMEM((B, nq), jnp.bfloat16),
        rowk=[pltpu.VMEM((8, KD), k_hbm.dtype) for _ in range(B)],
        rowv=[pltpu.VMEM((8, KD), v_hbm.dtype) for _ in range(B)],
    )


def layer_megakernel(
    qkv: jax.Array,  # [B, NQ+2KD] raw projection row (q in SLOT order)
    x: jax.Array,  # [..., H]
    gamma_mlp: jax.Array,
    pack: MegaPack,
    k_cache: jax.Array,  # [B, T, NKV, HD]
    v_cache: jax.Array,
    old_lens: jax.Array,  # [B] int32
    cos_t: jax.Array,  # [B, NKV*HD]
    sin_t: jax.Array,
    gamma_next: Optional[jax.Array] = None,
    *,
    num_heads: int,
    eps: float = 1e-5,
    scale: Optional[float] = None,
    depth: int = 3,
    interpret: Optional[bool] = None,
):
    """One decode layer in one kernel (module doc). Returns
    (x_out, qkv_next or None, k_cache', v_cache') — caches updated in
    place at row old_lens[b]."""
    import math

    B, T, NKV, HD = k_cache.shape
    NH = num_heads
    KD = NKV * HD
    NQ = NH * HD
    H, bn = pack.h_dim, pack.bn
    lead = x.shape[:-1]
    x2 = x.reshape(-1, H)
    Nq = pack.n_qkv * bn
    sm_scale = 1.0 / math.sqrt(HD) if scale is None else scale
    gm_nxt = (gamma_next if gamma_next is not None
              else jnp.ones((H,), jnp.float32))

    interp = _interpret_default() if interpret is None else interpret
    if interp:
        return _mega_ref(qkv, x2, gamma_mlp, pack, k_cache, v_cache,
                         old_lens, cos_t, sin_t, gm_nxt, num_heads=NH,
                         eps=eps, sm_scale=sm_scale, lead=lead)

    if T % 8:
        raise ValueError(
            f"layer_megakernel needs T % 8 == 0 (got T={T}): the cache "
            "write-back is an aligned 8-row RMW (init_kv_cache rounds up)")
    bt = 128
    while T % bt:
        bt //= 2
    k2 = k_cache.reshape(B, T, KD)
    v2 = v_cache.reshape(B, T, KD)
    x_out, qkv_next, k_out, v_out = pl.pallas_call(
        functools.partial(
            _mega_kernel,
            n_wo=pack.n_wo, n_gu=pack.n_gu, n_down=pack.n_down,
            n_qkv=pack.n_qkv, bn=bn, H=H, eps=eps, depth=depth,
            batch=B, nkv=NKV, group=NH // NKV, hd=HD, T=T, bt=bt,
            sm_scale=sm_scale,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H), x.dtype),
            jax.ShapeDtypeStruct((B, max(Nq, 128)), x.dtype),
            jax.ShapeDtypeStruct((B, T, KD), k_cache.dtype),
            jax.ShapeDtypeStruct((B, T, KD), v_cache.dtype),
        ),
        # args: [lens, qkv, x, gm, gm_nxt, cos, sin, s, w, k2, v2]
        input_output_aliases={9: 2, 10: 3},
        compiler_params=pltpu.CompilerParams(),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (H * H + 3 * H * pack.i_dim + H * Nq
                           + 2 * NH * T * HD),
            bytes_accessed=(pack.n_wo + pack.n_gu + pack.n_down
                            + pack.n_qkv) * H * bn
            + 2 * B * T * KD * k_cache.dtype.itemsize,
            transcendentals=B * (pack.i_dim + NH * T),
        ),
        interpret=False,
    )(
        old_lens.astype(jnp.int32), qkv, x2,
        gamma_mlp.reshape(1, H).astype(jnp.float32),
        gm_nxt.reshape(1, H).astype(jnp.float32),
        cos_t.astype(jnp.float32), sin_t.astype(jnp.float32),
        pack.s, pack.w, k2, v2,
    )
    x_out = x_out.reshape(*lead, H)
    qkv_next = qkv_next[:, :Nq] if pack.n_qkv else None
    return (x_out, qkv_next, k_out.reshape(B, T, NKV, HD),
            v_out.reshape(B, T, NKV, HD))


def _mega_ref(qkv, x2, gamma_mlp, pack, k_cache, v_cache, old_lens,
              cos_t, sin_t, gm_nxt, *, num_heads, eps, sm_scale, lead):
    """jnp oracle: slot-ordered attention + the permuted-pack tail."""
    from mila_tpu.kernels.layer_fused import (
        LayerPack, _layer_tail_ref, _qkv_tail_ref,
    )
    from mila_tpu.ops.attention import decode_attention

    B, T, NKV, HD = k_cache.shape
    NH = num_heads
    KD = NKV * HD
    NQ = NH * HD

    def rope_flat(xv, c, s):
        xg = xv.reshape(*xv.shape[:-1], xv.shape[-1] // HD, HD)
        y = jnp.concatenate([xg[..., HD // 2:], xg[..., : HD // 2]], axis=-1)
        y = y.reshape(xv.shape)
        return (xv.astype(jnp.float32) * c
                + y.astype(jnp.float32) * s).astype(xv.dtype)

    q = qkv[:, :NQ]
    cq = jnp.tile(cos_t[:, :HD], (1, NH))
    sq = jnp.tile(sin_t[:, :HD], (1, NH))
    q = rope_flat(q, cq, sq).reshape(B, NH, HD)  # slot order
    k_new = rope_flat(qkv[:, NQ : NQ + KD], cos_t, sin_t)
    v_new = qkv[:, NQ + KD :]

    rows = jnp.arange(B)
    kc = k_cache.reshape(B, T, KD)
    vc = v_cache.reshape(B, T, KD)
    kc = kc.at[rows, old_lens].set(k_new.astype(kc.dtype))
    vc = vc.at[rows, old_lens].set(v_new.astype(vc.dtype))
    kc4 = kc.reshape(B, T, NKV, HD)
    vc4 = vc.reshape(B, T, NKV, HD)

    # slot n attends kv head n % NKV: permute q slots into the
    # kv-grouped order decode_attention expects (head h -> kv h // G).
    G = NH // NKV
    slots = slot_order(NH, NKV)  # slot -> head; heads are kv-grouped
    inv = np.argsort(slots)  # head -> slot
    q_h = q[:, jnp.asarray(inv)]  # head-ordered queries
    att = decode_attention(
        q_h[:, None], kc4, vc4, old_lens + 1, scale=sm_scale
    )[:, 0]  # [B, NH(head), HD]
    att_slot = att[:, jnp.asarray(slots)]  # back to slot order
    att_flat = att_slot.reshape(B, NQ)

    lp = LayerPack(w=pack.w, s=pack.s, h_dim=pack.h_dim, i_dim=pack.i_dim,
                   bn=pack.bn, n_wo=pack.n_wo, n_gu=pack.n_gu,
                   n_down=pack.n_down, n_qkv=pack.n_qkv)
    x_out = _layer_tail_ref(att_flat.astype(jnp.bfloat16), x2, gamma_mlp,
                            lp, eps=eps)
    qkv_next = None
    if pack.n_qkv:
        qkv_next = _qkv_tail_ref(x_out, gm_nxt, lp, eps=eps)
    H = pack.h_dim
    return (x_out.reshape(*lead, H), qkv_next, kc4, vc4)
