"""2-D convolution ops (NHWC) + pooling.

Parity: reference Conv2D dev prototype (Mila/Dev/Modules/Conv2D — not in its
build) and the ROADMAP CNN-MNIST target (ROADMAP.md:316-318, 98–99%).
TPU-native: ``lax.conv_general_dilated`` lowers convs straight onto the MXU
(im2col-free); NHWC is the TPU-preferred layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def conv2d(
    x: jax.Array,  # [B, H, W, Cin]
    w: jax.Array,  # [KH, KW, Cin, Cout]
    b: Optional[jax.Array] = None,
    *,
    stride: int | tuple[int, int] = 1,
    padding: str = "SAME",
) -> jax.Array:
    if isinstance(stride, int):
        stride = (stride, stride)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def max_pool2d(x: jax.Array, window: int = 2, stride: Optional[int] = None) -> jax.Array:
    stride = stride or window
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )


def avg_pool2d(x: jax.Array, window: int = 2, stride: Optional[int] = None) -> jax.Array:
    stride = stride or window
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1), "VALID"
    )
    return summed / (window * window)
