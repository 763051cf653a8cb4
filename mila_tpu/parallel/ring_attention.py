"""Ring attention: context-parallel attention over a sequence-sharded axis.

SURVEY.md §2.10/§5 long-context plan (the reference has nothing — its
attention materializes [B,NH,T,T] and max_seq_len is checkpoint-fixed).
Construction (scaling-book / ring-attention): KV shards rotate around the
mesh axis with ``ppermute`` while each device accumulates online-softmax
partial attention for its local queries; communication overlaps compute and
total bytes equal one all-gather, but peak memory stays O(T/N).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _local_attention_update(q, k, v, m, l, o, q_start, kv_start, scale, causal):
    """One online-softmax update of (m, l, o) against a KV block.

    q: [B, Tq, NKV, G, D]; k/v: [B, Tkv, NKV, D]; statistics per query.
    """
    B, Tq, NKV, G, D = q.shape
    Tkv = k.shape[1]
    s = jnp.einsum(
        "bqhgd,bkhd->bhgqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tkv), 0) + q_start
        cols = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tkv), 1) + kv_start
        s = jnp.where((cols <= rows)[None, None, None], s, NEG_INF)
    m_curr = s.max(axis=-1)  # [B, NKV, G, Tq]
    m_new = jnp.maximum(m, m_curr)
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new[..., None])
    l_new = alpha * l + p.sum(axis=-1)
    o_new = alpha[..., None] * o + jnp.einsum(
        "bhgqk,bkhd->bhgqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return m_new, l_new, o_new


def ring_attention_local(
    q: jax.Array,  # [B, T_local, NH, D] — this device's query shard
    k: jax.Array,  # [B, T_local, NKV, D] — this device's KV shard
    v: jax.Array,
    axis_name: str,
    *,
    causal: bool = True,
    scale: Optional[float] = None,
) -> jax.Array:
    """Call inside shard_map with the sequence sharded over ``axis_name``."""
    B, Tl, NH, D = q.shape
    NKV = k.shape[2]
    G = NH // NKV
    scale = 1.0 / math.sqrt(D) if scale is None else scale
    N = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    q_start = idx * Tl
    qg = q.reshape(B, Tl, NKV, G, D).astype(jnp.float32)

    m = jnp.full((B, NKV, G, Tl), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, NKV, G, Tl), jnp.float32)
    o = jnp.zeros((B, NKV, G, Tl, D), jnp.float32)

    perm = [(i, (i + 1) % N) for i in range(N)]
    k_blk, v_blk = k, v
    for step in range(N):
        src = (idx - step) % N
        kv_start = src * Tl
        m, l, o = _local_attention_update(
            qg, k_blk.astype(jnp.float32), v_blk.astype(jnp.float32),
            m, l, o, q_start, kv_start, scale, causal,
        )
        if step < N - 1:
            # Rotate KV around the ring; ppermute is point-to-point on ICI.
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = (o / l_safe[..., None]).transpose(0, 3, 1, 2, 4).reshape(B, Tl, NH, D)
    return out.astype(q.dtype)


def ring_attention(
    q: jax.Array,  # [B, T, NH, D] global
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    seq_axis: str = "data",
    causal: bool = True,
    scale: Optional[float] = None,
) -> jax.Array:
    """shard_map wrapper: shards the sequence over ``seq_axis`` and runs the
    ring. T must divide the axis size."""
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = P(None, seq_axis, None, None)
    fn = shard_map(
        functools.partial(
            ring_attention_local, axis_name=seq_axis, causal=causal, scale=scale
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
