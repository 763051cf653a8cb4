"""Mosaic feasibility probes for the single-kernel decode layer:

(a) q unpack: [1, NQ] row -> [NH, KD] lane-packed via broadcast-dot + mask
(b) att flatten: [NH, HD] -> [1, NQ] via lane-tile + mask + ones-dot
(c) sublane concat of B [1, NQ] rows -> [B, NQ]

Usage: python benchmarks/r4_probe.py
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import benchmarks  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, NH, NKV, HD = 8, 32, 8, 64
KD, NQ = NKV * HD, NH * HD
G = NH // NKV


def _probe_kernel(qkv_ref, att_ref, qpk_ref, flat_ref, *, nh, nkv, hd):
    kd = nkv * hd
    nq = nh * hd
    # (a) q unpack per b: broadcast the row to NH sublanes, mask to the
    # packed layout, fold NQ lanes -> KD by summing the G chunks.
    lane = jax.lax.broadcasted_iota(jnp.int32, (nh, nq), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (nh, nq), 0)
    sel = (lane >= row * hd) & (lane < (row + 1) * hd)
    ones_col = jnp.ones((nh, 1), jnp.bfloat16)
    for b in range(B):
        q_row = qkv_ref[b : b + 1, :nq].astype(jnp.bfloat16)  # [1, NQ]
        bcast = jax.lax.dot(ones_col, q_row,
                            preferred_element_type=jnp.float32)  # [NH, NQ]
        masked = jnp.where(sel, bcast, 0.0)
        packed = None
        for c in range(nq // kd):
            part = masked[:, c * kd : (c + 1) * kd]
            packed = part if packed is None else packed + part
        qpk_ref[b] = packed.astype(qpk_ref.dtype)

    # (b) att flatten per b + (c) sublane assembly into [B, NQ].
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (nh, nq), 1)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (nh, nq), 0)
    sel2 = (lane2 >= row2 * hd) & (lane2 < (row2 + 1) * hd)
    ones_row = jnp.ones((1, nh), jnp.float32)
    rows = []
    for b in range(B):
        att = att_ref[b].astype(jnp.float32)  # [NH, HD]
        tiled = jnp.concatenate([att] * (nq // hd), axis=1)  # [NH, NQ]
        m = jnp.where(sel2, tiled, 0.0)
        flat = jax.lax.dot(ones_row, m,
                           preferred_element_type=jnp.float32)  # [1, NQ]
        rows.append(flat)
    flat_ref[...] = jnp.concatenate(rows, axis=0).astype(flat_ref.dtype)


def main():
    key = jax.random.key(0)
    qkv = jax.random.normal(key, (B, NQ + 2 * KD), jnp.bfloat16)
    att = jax.random.normal(jax.random.fold_in(key, 1), (B, NH, HD),
                            jnp.bfloat16)
    qpk, flat = pl.pallas_call(
        functools.partial(_probe_kernel, nh=NH, nkv=NKV, hd=HD),
        out_shape=(
            jax.ShapeDtypeStruct((B, NH, KD), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, NQ), jnp.bfloat16),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(qkv, att)

    # Oracles
    from mila_tpu.kernels.dense_attention import pack_queries

    # (a): our "packed" target uses kv(n) lane ranges; the probe's fold
    # produces head n's vector at lanes (n*HD mod KD) — which IS kv-packed
    # iff kv(n) == (n*HD mod KD)/HD == n mod NKV. pack_queries uses
    # kv(n) = n // G. The probe demonstrates the MECHANISM; numerics are
    # checked against the mod-NKV packing here.
    q = np.asarray(qkv[:, :NQ], np.float32).reshape(B, NH, HD)
    want_a = np.zeros((B, NH, KD), np.float32)
    for n in range(NH):
        j = n % NKV
        want_a[:, n, j * HD : (j + 1) * HD] = q[:, n]
    np.testing.assert_allclose(np.asarray(qpk, np.float32), want_a,
                               rtol=2e-2, atol=2e-2)
    want_b = np.asarray(att, np.float32).reshape(B, NQ)
    np.testing.assert_allclose(np.asarray(flat, np.float32), want_b,
                               rtol=2e-2, atol=2e-2)
    print("probe OK: unpack + flatten + assemble all compile and match")


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    main()
