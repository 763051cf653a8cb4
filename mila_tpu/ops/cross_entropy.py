"""Fused softmax + cross-entropy loss with manual VJP, plus plain CE.

Parity: reference ``CpuSoftmaxCrossEntropyOp.ixx`` / CUDA kernels
``Kernels/CudaSoftmaxCrossEntropy.cu:25-366`` (fused fwd producing per-row
loss from logits + int targets; backward producing dlogits = softmax − onehot),
``CpuCrossEntropyOp.ixx`` (plain CE over probabilities). Running the loss on
device fixes the reference's known CPU-loss bottleneck (Mnist.cpp:437-451,
ROADMAP Week 2).

Supports an ``ignore_index`` (rows with that target contribute zero loss and
zero gradient) and optional padded-vocab masking for GPT-2's Vp > V logits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _logsumexp(x32: jax.Array) -> tuple[jax.Array, jax.Array]:
    m = x32.max(axis=-1, keepdims=True)
    lse = jnp.log(jnp.exp(x32 - m).sum(axis=-1, keepdims=True)) + m
    return lse, m


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def softmax_cross_entropy(
    logits: jax.Array, targets: jax.Array, ignore_index: int = -100
) -> jax.Array:
    """Per-example CE loss from raw logits and integer targets.

    logits: [..., V] (any float dtype; math in f32); targets: [...] int.
    Returns loss of shape [...] (no reduction — caller means/sums, matching
    the reference component contract ``forward(logits, targets, loss)``).
    """
    x32 = logits.astype(jnp.float32)
    lse, _ = _logsumexp(x32)
    safe_t = jnp.where(targets == ignore_index, 0, targets)
    picked = jnp.take_along_axis(x32, safe_t[..., None], axis=-1)
    loss = (lse - picked)[..., 0]
    return jnp.where(targets == ignore_index, 0.0, loss)


def _ce_fwd(logits, targets, ignore_index):
    loss = softmax_cross_entropy(logits, targets, ignore_index)
    return loss, (logits, targets)


def _ce_bwd(ignore_index, res, g):
    logits, targets = res
    x32 = logits.astype(jnp.float32)
    lse, _ = _logsumexp(x32)
    probs = jnp.exp(x32 - lse)
    onehot = jax.nn.one_hot(
        jnp.where(targets == ignore_index, -1, targets), logits.shape[-1], dtype=jnp.float32
    )
    # dlogits = (softmax − onehot) · g, zeroed on ignored rows
    # (CudaSoftmaxCrossEntropy.cu:164 backward parity).
    mask = (targets != ignore_index).astype(jnp.float32)[..., None]
    dlogits = (probs - onehot) * g.astype(jnp.float32)[..., None] * mask
    return dlogits.astype(logits.dtype), None


softmax_cross_entropy.defvjp(_ce_fwd, _ce_bwd)


def cross_entropy_from_probs(
    probs: jax.Array, targets: jax.Array, eps: float = 1e-10
) -> jax.Array:
    """Plain CE over already-softmaxed probabilities (CpuCrossEntropyOp parity)."""
    picked = jnp.take_along_axis(probs.astype(jnp.float32), targets[..., None], axis=-1)
    return -jnp.log(picked[..., 0] + eps)


def softmax_cross_entropy_ref(logits, targets, ignore_index: int = -100):
    """Oracle via log_softmax + gather (autodiff backward)."""
    x32 = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(x32, axis=-1)
    safe_t = jnp.where(targets == ignore_index, 0, targets)
    loss = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
    return jnp.where(targets == ignore_index, 0.0, loss)
