"""FP8 -> INT8 weight requantization for the decode weight streams.

FP8 and INT8 are both one byte/element, so fp8's only decode-path value is
numerics, not bandwidth — while its in-kernel bit-decode costs 2.03
us/tile against int8's 1.49 in the auto-pipelined stream
(benchmarks/r5_stream_probe.py), which is exactly the r4 fp8 regression
(VERDICT r5 item 2). Weights are static: re-expressing the fp8 values on
an int8 grid at pack time is free at load and makes the fp8 decode stream
bit-identical in SPEED to int8. The numeric delta (int8's 127-step linear
grid vs e4m3's 3-bit mantissa) is recorded by the GPT-2 quantized
perplexity gate (models/evaluation.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from mila_tpu.inference.quantize import QTensor


def requantize_int8(qt: QTensor) -> QTensor:
    """Re-express an fp8 QTensor's VALUES on an int8 grid with the same
    scale-block structure. int8 QTensors pass through unchanged."""
    if qt.packed_rows:
        return qt  # packed int4: not an fp8 stream, leave to the caller
    if jnp.dtype(qt.q.dtype) not in (jnp.dtype(jnp.float8_e4m3fn),
                                     jnp.dtype(jnp.float8_e5m2)):
        return qt
    v = qt.q.astype(jnp.float32)  # exact fp8 decode
    K, N = v.shape
    bs = qt.block_size
    vb = v.reshape(K // bs, bs, N)
    m = jnp.max(jnp.abs(vb), axis=1, keepdims=True)  # [K//bs, 1, N]
    m = jnp.where(m == 0.0, 1.0, m)
    q8 = jnp.round(vb / m * 127.0).astype(jnp.int8).reshape(K, N)
    scale = qt.scale * (m[:, 0, :] / 127.0)
    return QTensor(q8, scale.astype(jnp.float32), bs, None)
