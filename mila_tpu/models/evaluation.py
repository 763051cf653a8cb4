"""Evaluation utilities: perplexity, accuracy, quantization-delta gates.

BASELINE requires "FP32/BF16 reference perplexity within tolerance at the
same bit-width" (perplexity-Δ check for INT8/FP8 weight-only). The reference
computes CharLM perplexity inline (CharLM.cpp:273-319); here it's a reusable
module working over any token reader and cache-less model forward.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mila_tpu.ops import softmax_cross_entropy


def dataset_loss(
    model,
    params: Any,
    batches: Iterable,
    *,
    max_batches: int = 0,
) -> float:
    """Mean next-token CE loss over (inputs, targets) int batches."""

    @jax.jit
    def batch_loss(params, xb, yb):
        logits = model.apply(params, xb)
        return softmax_cross_entropy(logits, yb).mean()

    losses = []
    for i, (xb, yb) in enumerate(batches):
        if max_batches and i >= max_batches:
            break
        losses.append(batch_loss(params, jnp.asarray(xb), jnp.asarray(yb)))
    if not losses:
        raise ValueError("no batches to evaluate")
    return float(jnp.stack(losses).mean())


def perplexity(
    model, params: Any, batches: Iterable, *, max_batches: int = 0
) -> float:
    """exp(mean CE) — token-level perplexity."""
    return math.exp(min(dataset_loss(model, params, batches, max_batches=max_batches), 30.0))


def perplexity_delta(
    model,
    params_ref: Any,
    params_test: Any,
    batches_factory,
    *,
    max_batches: int = 8,
) -> dict:
    """Perplexity gap between two parameterizations of the same model
    (the BASELINE quantization acceptance gate).

    ``batches_factory()`` must return a fresh batch iterator each call.
    """
    ppl_ref = perplexity(model, params_ref, batches_factory(), max_batches=max_batches)
    ppl_test = perplexity(model, params_test, batches_factory(), max_batches=max_batches)
    return {
        "ppl_ref": ppl_ref,
        "ppl_test": ppl_test,
        "delta": ppl_test - ppl_ref,
        "rel_delta": (ppl_test - ppl_ref) / ppl_ref,
    }


def top1_accuracy(model, params: Any, batches: Iterable, *, max_batches: int = 0) -> float:
    @jax.jit
    def batch_acc(params, xb, yb):
        pred = jnp.argmax(model.apply(params, xb), axis=-1)
        return (pred == yb).mean()

    accs = []
    for i, (xb, yb) in enumerate(batches):
        if max_batches and i >= max_batches:
            break
        accs.append(batch_acc(params, jnp.asarray(xb), jnp.asarray(yb)))
    return float(jnp.stack(accs).mean())
