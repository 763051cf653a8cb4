"""Grid-based layer-tail decode stream: wo(+res) -> RMSNorm -> SwiGLU ->
down(+res) -> next layer's RMSNorm+wqkv as ONE Pallas weight stream, with
the tile loop as the PALLAS GRID instead of an unrolled manual DMA ring.

Supersedes kernels/layer_fused.py's run_scoped construction for the decode
path. Same math and stream order, two structural changes:

1. The grid (one step per weight tile) lets Mosaic's automatic pipeliner
   double-buffer the [bk, bn] tile fetches — the unrolled 124-tile ring
   compiled to a ~20-minute Mosaic build per LAYER VARIANT and made engine
   startup and benches compile-bound.
2. The weights of all layers are stacked in a single [L*T, bk, bn] HBM
   array and the STATIC layer id bakes that layer's tile base into the
   compiled kernel — each layer id is its own (weight-free, cheap)
   specialization of one kernel body, all reading the same stacked array.
   A second tiny variant (n_qkv=0) serves the last layer.

Parity anchor: the reference caches one cuBLASLt plan per Linear with fused
epilogues (CudaLinearOp.ixx:147-225); the TPU analogue is one resident
weight stream per layer tail, and ONE compiled plan reused by all layers.

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
from mila_tpu.kernels.layer_fused import (
    LayerPack,
    _layer_tail_ref,
    _qkv_tail_ref,
    pack_layer,
)
from mila_tpu.kernels.quant_matmul import _load_w


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


class LayerStream(NamedTuple):
    """All decoder layers' tail weights stacked for the grid kernel.

    ``w``/``s`` hold the first ``n_layers - 1`` layers (each with the next
    layer's wqkv appended); ``w_last``/``s_last`` hold the final layer's
    tail (no qkv segment). Tile order inside a layer matches LayerPack:
    [wo | g0 u0 g1 u1 ... | down k-major | wqkv_next].
    """

    w: jax.Array  # [(L-1)*T_full, bk, bn]
    s: jax.Array  # [(L-1)*T_full, 1, bn] f32
    w_last: jax.Array  # [T_tail, bk, bn]
    s_last: jax.Array  # [T_tail, 1, bn] f32
    h_dim: int
    i_dim: int
    bn: int
    n_wo: int
    n_gu: int
    n_down: int
    n_qkv: int
    n_layers: int


jax.tree_util.register_pytree_node(
    LayerStream,
    lambda t: ((t.w, t.s, t.w_last, t.s_last), tuple(t[4:])),
    lambda aux, leaves: LayerStream(*leaves, *aux),
)


def pack_layer_stream(packs) -> Optional[LayerStream]:
    """Stack per-layer :func:`pack_layer` outputs into one stream.

    ``packs``: list of LayerPack, layers 0..L-1 where packs[i] carries
    layer i+1's wqkv (pack.n_qkv > 0) for i < L-1 and packs[-1].n_qkv == 0.
    """
    if not packs or any(p is None for p in packs):
        return None
    first, last = packs[0], packs[-1]
    if len(packs) > 1:
        if any(p.n_qkv != first.n_qkv for p in packs[:-1]):
            return None
        if last.n_qkv != 0:
            return None
        body = packs[:-1]
        w = jnp.concatenate([p.w for p in body])
        s = jnp.concatenate([p.s for p in body])
    else:
        w = first.w[:0]
        s = first.s[:0]
    return LayerStream(
        w=w, s=s, w_last=last.w, s_last=last.s,
        h_dim=first.h_dim, i_dim=first.i_dim, bn=first.bn,
        n_wo=first.n_wo, n_gu=first.n_gu, n_down=first.n_down,
        n_qkv=first.n_qkv, n_layers=len(packs),
    )


def _stream_kernel(
    att_ref,  # [B, H] VMEM attention output
    x_ref,  # [B, H] VMEM residual stream
    gm_mlp_ref,  # [1, H] f32
    gm_nxt_ref,  # [1, H] f32 (ones when n_qkv == 0)
    s_hbm,  # [Ltot, 1, bn] f32 ANY/HBM — whole layer's rows fetched once
    w_hbm,  # [Ltot, bk, bn] ANY/HBM — manual depth-3 ring with STATIC
    #         addresses (auto pipelining is capped at double buffering =
    #         ~610 GB/s; three in-flight DMAs measured 721 GB/s, and
    #         dynamic descriptor addresses cost ~0.2us/tile of scalar work,
    #         so the layer base offset is a compile-time constant — the
    #         small grid body makes per-layer compiles cheap)
    o_ref,  # [B, H]
    qkv_ref,  # [B, max(Nq, 128)]
    w_buf,  # VMEM [depth, tps, bk, bn]
    w_sem,  # DMA sems (depth,)
    s_buf,  # VMEM [n_tiles, 1, bn] f32 (whole layer's scale rows)
    s_sem,
    x1_scr,  # VMEM [n_wo, B, bn] f32
    xn_scr,  # VMEM [B, H] bf16
    g_scr,  # VMEM [B, bn] f32
    h_scr,  # VMEM [n_gu // 2, B, bn] bf16
    acc_scr,  # VMEM [n_cols, B, bn] f32
    qkv_scr,  # VMEM [max(n_qkv, 1), B, bn] f32
    *,
    n_wo: int,
    n_gu: int,
    n_down: int,
    n_qkv: int,
    bn: int,
    H: int,
    eps: float,
    depth: int,
    n_tiles: int,
    tps: int,
    base: int,  # static first-tile index of this layer in w_hbm
):
    t = pl.program_id(0)
    n_cols = H // bn
    cpb = H // bn  # h chunks per down K tile (bk == H)
    n_steps = n_tiles // tps

    def copy(slot, idx):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(base + idx * tps, tps)],
            w_buf.at[slot], w_sem.at[slot],
        )

    @pl.when(t == 0)
    def _prologue():
        for d in range(min(depth, n_steps)):
            copy(d, d).start()
        pltpu.make_async_copy(
            s_hbm.at[pl.ds(base, n_tiles)], s_buf, s_sem
        ).start()
        pltpu.make_async_copy(
            s_hbm.at[pl.ds(base, n_tiles)], s_buf, s_sem
        ).wait()

    slot = jax.lax.rem(t, depth)
    copy(slot, t).wait()

    @pl.when(t + depth < n_steps)
    def _issue_next():
        copy(jax.lax.rem(t + depth, depth), t + depth).start()

    last_down = n_wo + n_gu + n_down - 1
    for i in range(tps):
        tt = t * tps + i  # global tile index (dynamic t, static lane i)
        w = _load_w(w_buf[slot, i])
        s = s_buf[tt, 0]

        @pl.when(tt < n_wo)
        def _wo(tt=tt, w=w, s=s):
            att = att_ref[...].astype(jnp.bfloat16)
            p = jax.lax.dot(att, w, preferred_element_type=jnp.float32)
            # residual chunk for this tile's columns (tt is dynamic; n_wo
            # is small — a select chain is VPU-free next to the tile DMA)
            xc = x_ref[:, :bn].astype(jnp.float32)
            for c in range(1, n_wo):
                xc = jnp.where(
                    tt == c,
                    x_ref[:, c * bn : (c + 1) * bn].astype(jnp.float32), xc,
                )
            x1_scr[tt] = p * s[None, :] + xc

            @pl.when(tt == n_wo - 1)
            def _norm():
                x1 = jnp.concatenate(
                    [x1_scr[c] for c in range(n_wo)], axis=1
                )
                rstd = jax.lax.rsqrt(
                    jnp.mean(jnp.square(x1), axis=-1, keepdims=True) + eps
                )
                xn_scr[...] = (x1 * rstd * gm_mlp_ref[0][None, :]).astype(
                    jnp.bfloat16
                )

        @pl.when((tt >= n_wo) & (tt < n_wo + n_gu))
        def _gu(tt=tt, w=w, s=s):
            j = tt - n_wo
            p = (jax.lax.dot(xn_scr[...], w,
                             preferred_element_type=jnp.float32)
                 * s[None, :])

            @pl.when(j % 2 == 0)
            def _gate():
                g_scr[...] = p

            @pl.when(j % 2 == 1)
            def _up():
                g = g_scr[...]
                h_scr[j // 2] = (g * jax.nn.sigmoid(g) * p).astype(
                    jnp.bfloat16
                )

        @pl.when((tt >= n_wo + n_gu) & (tt < n_wo + n_gu + n_down))
        def _down(tt=tt, w=w, s=s):
            jd = tt - n_wo - n_gu
            k = jd // n_cols
            n = jd % n_cols
            xk = jnp.concatenate(
                [h_scr[k * cpb + c] for c in range(cpb)], axis=1
            ) if cpb > 1 else h_scr[k * cpb]
            p = (jax.lax.dot(xk, w, preferred_element_type=jnp.float32)
                 * s[None, :])

            @pl.when(k == 0)
            def _first():
                acc_scr[n] = p

            @pl.when(k > 0)
            def _rest():
                acc_scr[n] = acc_scr[n] + p

        @pl.when(tt == last_down)
        def _finish_mlp(tt=tt):
            x1 = jnp.concatenate([x1_scr[c] for c in range(n_wo)], axis=1)
            out = jnp.concatenate(
                [acc_scr[c] for c in range(n_cols)], axis=1
            )
            x_out = out + x1
            o_ref[...] = x_out.astype(o_ref.dtype)
            if n_qkv:
                rstd = jax.lax.rsqrt(
                    jnp.mean(jnp.square(x_out), axis=-1, keepdims=True)
                    + eps
                )
                xn_scr[...] = (
                    x_out * rstd * gm_nxt_ref[0][None, :]
                ).astype(jnp.bfloat16)
            else:
                qkv_ref[...] = jnp.zeros_like(qkv_ref)

        if n_qkv:
            @pl.when(tt > last_down)
            def _qkv(tt=tt, w=w, s=s):
                n = tt - last_down - 1
                qkv_scr[n] = (
                    jax.lax.dot(xn_scr[...], w,
                                preferred_element_type=jnp.float32)
                    * s[None, :]
                )

                @pl.when(n == n_qkv - 1)
                def _emit():
                    for c in range(n_qkv):
                        qkv_ref[:, c * bn : (c + 1) * bn] = qkv_scr[
                            c
                        ].astype(qkv_ref.dtype)


def layer_tail_stream(
    att: jax.Array,  # [..., H] attention output (prod(leading) <= 32)
    x: jax.Array,  # [..., H] residual stream
    gamma_mlp: jax.Array,  # [H]
    stream: LayerStream,
    layer: int,  # STATIC layer id (baked into the compiled kernel)
    gamma_next: Optional[jax.Array] = None,
    *,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """x1 = att @ wo + x; h = swiglu(rms(x1) @ wgu); x_out = h @ down + x1;
    qkv = rms(x_out, gamma_next) @ wqkv_next. Returns (x_out, qkv or None
    for the last layer). ``layer`` indexes the stacked stream and must be a
    Python int: the tile base address is a compile-time constant, so each
    layer id gets its own (cheap, weight-free) kernel specialization."""
    if not isinstance(layer, int):
        raise TypeError(
            f"layer_tail_stream needs a static int layer id, got "
            f"{type(layer).__name__}: the weight-stream base address is "
            "baked into the compiled kernel")
    H, bn = stream.h_dim, stream.bn
    lead = x.shape[:-1]
    a2 = att.reshape(-1, H)
    x2 = x.reshape(-1, H)
    B = x2.shape[0]
    if B > 32:
        raise ValueError(f"layer_tail_stream is decode-only (M={B} > 32)")
    is_last = (
        layer == stream.n_layers - 1 if isinstance(layer, int) else False
    )
    n_qkv = 0 if is_last else stream.n_qkv
    Nq = n_qkv * bn
    gm_nxt = (gamma_next if gamma_next is not None
              else jnp.ones((H,), jnp.float32))

    interp = _interpret_default() if interpret is None else interpret
    if interp:
        pack = _pack_view(stream, layer, is_last)
        x_out = _layer_tail_ref(a2, x2, gamma_mlp, pack, eps=eps)
        qkv = None
        if n_qkv:
            qkv = _qkv_tail_ref(x_out, gm_nxt, pack, eps=eps)
            qkv = qkv.reshape(*lead, Nq)
        return x_out.reshape(*lead, H), qkv

    if is_last:
        w, s = stream.w_last, stream.s_last
        lidx = 0
        n_tiles = stream.n_wo + stream.n_gu + stream.n_down
    else:
        w, s = stream.w, stream.s
        lidx = layer
        n_tiles = stream.n_wo + stream.n_gu + stream.n_down + stream.n_qkv

    n_cols = H // bn
    bk = w.shape[1]
    tile_bytes = bk * bn * w.dtype.itemsize
    # Tile group per grid step (amortizes per-step overhead); manual ring
    # depth 3 (see kernel doc) within ~6MB of VMEM weight buffers.
    tps = 1
    while (tps * 2 * tile_bytes <= 2 * 1024 * 1024
           and n_tiles % (tps * 2) == 0):
        tps *= 2
    depth = max(2, min(3, (6 * 1024 * 1024) // (tps * tile_bytes)))
    n_steps = n_tiles // tps
    kern = functools.partial(
        _stream_kernel,
        n_wo=stream.n_wo, n_gu=stream.n_gu, n_down=stream.n_down,
        n_qkv=n_qkv, bn=bn, H=H, eps=eps, depth=depth, n_tiles=n_tiles,
        tps=tps, base=lidx * n_tiles,
    )
    x_out, qkv = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((depth, tps, bk, bn), w.dtype),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.VMEM((n_tiles, 1, bn), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((stream.n_wo, B, bn), jnp.float32),
            pltpu.VMEM((B, H), jnp.bfloat16),
            pltpu.VMEM((B, bn), jnp.float32),
            pltpu.VMEM((stream.n_gu // 2, B, bn), jnp.bfloat16),
            pltpu.VMEM((n_cols, B, bn), jnp.float32),
            pltpu.VMEM((max(n_qkv, 1), B, bn), jnp.float32),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, H), x.dtype),
            jax.ShapeDtypeStruct((B, max(Nq, 128)), x.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (H * H + 3 * H * stream.i_dim + H * Nq),
            bytes_accessed=n_tiles * w.shape[1] * bn * w.dtype.itemsize,
            transcendentals=B * stream.i_dim,
        ),
        interpret=False,
    )(
        a2, x2,
        gamma_mlp.reshape(1, H).astype(jnp.float32),
        gm_nxt.reshape(1, H).astype(jnp.float32), s, w,
    )
    x_out = x_out.reshape(*lead, H)
    if n_qkv == 0:
        return x_out, None
    return x_out, qkv[:, :Nq].reshape(*lead, Nq)


def _pack_view(stream: LayerStream, layer, is_last: bool) -> LayerPack:
    """Per-layer LayerPack view of the stacked stream (CPU oracle path)."""
    if is_last:
        return LayerPack(
            w=stream.w_last, s=stream.s_last, h_dim=stream.h_dim,
            i_dim=stream.i_dim, bn=stream.bn, n_wo=stream.n_wo,
            n_gu=stream.n_gu, n_down=stream.n_down, n_qkv=0,
        )
    T = stream.n_wo + stream.n_gu + stream.n_down + stream.n_qkv
    return LayerPack(
        w=jax.lax.dynamic_slice_in_dim(stream.w, layer * T, T),
        s=jax.lax.dynamic_slice_in_dim(stream.s, layer * T, T),
        h_dim=stream.h_dim, i_dim=stream.i_dim, bn=stream.bn,
        n_wo=stream.n_wo, n_gu=stream.n_gu, n_down=stream.n_down,
        n_qkv=stream.n_qkv,
    )
