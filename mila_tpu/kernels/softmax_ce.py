"""Fused softmax + cross-entropy Pallas kernel (fwd + dlogits bwd).

Parity: reference fused CUDA loss kernels
(Kernels/CudaSoftmaxCrossEntropy.cu:25-366 — fwd producing per-row loss from
logits + int targets; backward producing dlogits = softmax − onehot). One
pass over the vocab axis per row tile: row max, exp-sum, and the target
logit pick all fuse in VMEM; the backward kernel recomputes softmax from
logits (cheaper than storing probs for GPT-sized vocabs).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mila_tpu.ops.cross_entropy import softmax_cross_entropy as _jnp_ce


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def _ce_fwd_kernel(logits_ref, targets_ref, loss_ref, *, ignore_index: int):
    # Row-wise operands are [bm, 1]: jax-0.9 Pallas forbids partial rank-1
    # blocks, so callers pass targets/loss as column vectors.
    x = logits_ref[...].astype(jnp.float32)  # [bm, V]
    t = targets_ref[...]  # [bm, 1]
    m = jnp.max(x, axis=-1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True)) + m
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    picked = jnp.sum(jnp.where(cols == t, x, 0.0), axis=-1, keepdims=True)
    loss = lse - picked
    loss_ref[...] = jnp.where(t == ignore_index, 0.0, loss)


def _ce_bwd_kernel(logits_ref, targets_ref, g_ref, dlogits_ref, *, ignore_index: int):
    x = logits_ref[...].astype(jnp.float32)
    t = targets_ref[...]  # [bm, 1]
    gl = g_ref[...].astype(jnp.float32)  # [bm, 1]
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    onehot = (cols == t).astype(jnp.float32)
    valid = (t != ignore_index).astype(jnp.float32)
    dlogits_ref[...] = ((probs - onehot) * gl * valid).astype(
        dlogits_ref.dtype
    )


def _rows_call(kernel, out_shape, logits2, *extra, block_rows, interpret):
    M, V = logits2.shape
    grid = (M // block_rows,)
    in_specs = [pl.BlockSpec((block_rows, V), lambda i: (i, 0))]
    for a in extra:
        in_specs.append(pl.BlockSpec((block_rows, a.shape[1]), lambda i: (i, 0)))
    out_specs = pl.BlockSpec((block_rows, out_shape.shape[1]), lambda i: (i, 0))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=_interpret_default() if interpret is None else interpret,
    )(logits2, *extra)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_softmax_cross_entropy(
    logits: jax.Array,
    targets: jax.Array,
    ignore_index: int = -100,
    block_rows: int = 8,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused CE over the last axis. logits [..., V], targets [...] → [...]."""
    return _fused_ce_impl(logits, targets, ignore_index, block_rows, interpret)


def _fused_ce_impl(logits, targets, ignore_index, block_rows, interpret):
    V = logits.shape[-1]
    lead = logits.shape[:-1]
    logits2 = logits.reshape(-1, V)
    t1 = targets.reshape(-1).astype(jnp.int32)
    M = logits2.shape[0]
    if M % block_rows or V % 128:
        return _jnp_ce(logits, targets, ignore_index)
    loss = _rows_call(
        functools.partial(_ce_fwd_kernel, ignore_index=ignore_index),
        jax.ShapeDtypeStruct((M, 1), jnp.float32),
        logits2,
        t1[:, None],
        block_rows=block_rows,
        interpret=interpret,
    )
    return loss[:, 0].reshape(lead)


def _fce_fwd(logits, targets, ignore_index, block_rows, interpret):
    loss = _fused_ce_impl(logits, targets, ignore_index, block_rows, interpret)
    return loss, (logits, targets)


def _fce_bwd(ignore_index, block_rows, interpret, res, g):
    logits, targets = res
    V = logits.shape[-1]
    logits2 = logits.reshape(-1, V)
    t1 = targets.reshape(-1).astype(jnp.int32)
    g1 = g.reshape(-1).astype(jnp.float32)
    M = logits2.shape[0]
    if M % block_rows or V % 128:
        # jnp fallback backward.
        _, vjp = jax.vjp(lambda l: _jnp_ce(l, targets, ignore_index), logits)
        return vjp(g)[0], None
    dlogits = _rows_call(
        functools.partial(_ce_bwd_kernel, ignore_index=ignore_index),
        jax.ShapeDtypeStruct((M, V), logits.dtype),
        logits2,
        t1[:, None],
        g1[:, None],
        block_rows=block_rows,
        interpret=interpret,
    )
    return dlogits.reshape(logits.shape), None


fused_softmax_cross_entropy.defvjp(_fce_fwd, _fce_bwd)
