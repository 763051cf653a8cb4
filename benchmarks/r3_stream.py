"""Round-3 DMA-pattern experiments: what read bandwidth can one v5e core
actually sustain, and with what chunk size / pipeline depth?

The grid-pipelined kernels converge at ~680 GB/s regardless of compute
(r3_experiments.py), i.e. the DMA pattern — not the VPU cast — is the
ceiling. This sweeps pure streaming kernels:

  grid:<MB>     Pallas grid auto-pipeline, one <MB>-sized block per step
  man<D>:<MB>   manual make_async_copy ring of D buffers x <MB> chunks

Usage: python benchmarks/r3_stream.py
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

from benchmarks.decode_sweep import timed_loop

WIDTH = 2048
NBYTES = 512 * 1024 * 1024


def _grid_kernel(x_ref, w_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = x_ref[...]

    o_ref[...] += jnp.sum(w_ref[:8].astype(jnp.float32), axis=0, keepdims=True)


def grid_stream(block_rows):
    rows = NBYTES // WIDTH
    w = jnp.ones((rows, WIDTH), jnp.int8)

    def run(x, w):
        return pl.pallas_call(
            _grid_kernel,
            out_shape=jax.ShapeDtypeStruct((1, WIDTH), jnp.float32),
            grid=(rows // block_rows,),
            in_specs=[
                pl.BlockSpec((1, WIDTH), lambda i: (0, 0)),
                pl.BlockSpec((block_rows, WIDTH), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((1, WIDTH), lambda i: (0, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(x, w)

    t = timed_loop(run, jnp.zeros((1, WIDTH), jnp.float32), w, max_n=256)
    return NBYTES / t


def _manual_kernel(x_ref, w_hbm, o_ref, *, depth, chunk_rows, n_chunks):
    def body(scratch, sems):
        def get(slot, idx):
            return pltpu.make_async_copy(
                w_hbm.at[pl.ds(idx * chunk_rows, chunk_rows)],
                scratch.at[slot],
                sems.at[slot],
            )

        for d in range(depth):
            get(d, d).start()

        o_ref[...] = x_ref[...]

        def step(i, acc):
            slot = jax.lax.rem(i, depth)
            get(slot, i).wait()
            acc = acc + jnp.sum(
                scratch[slot, :8].astype(jnp.float32), axis=0, keepdims=True
            )

            @pl.when(i + depth < n_chunks)
            def _():
                get(slot, i + depth).start()

            return acc

        o_ref[...] += jax.lax.fori_loop(
            0, n_chunks, step, jnp.zeros((1, WIDTH), jnp.float32)
        )

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((depth, chunk_rows, WIDTH), jnp.int8),
        sems=pltpu.SemaphoreType.DMA((depth,)),
    )


def manual_stream(depth, chunk_rows):
    rows = NBYTES // WIDTH
    n_chunks = rows // chunk_rows
    w = jnp.ones((rows, WIDTH), jnp.int8)

    def run(x, w):
        return pl.pallas_call(
            functools.partial(_manual_kernel, depth=depth,
                              chunk_rows=chunk_rows, n_chunks=n_chunks),
            out_shape=jax.ShapeDtypeStruct((1, WIDTH), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, w)

    t = timed_loop(run, jnp.zeros((1, WIDTH), jnp.float32), w, max_n=256)
    return NBYTES / t


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    cases = [
        ("grid 1MB", lambda: grid_stream(512)),
        ("grid 2MB", lambda: grid_stream(1024)),
        ("grid 4MB", lambda: grid_stream(2048)),
        ("man2 2MB", lambda: manual_stream(2, 1024)),
        ("man2 4MB", lambda: manual_stream(2, 2048)),
        ("man3 4MB", lambda: manual_stream(3, 2048)),
        ("man4 2MB", lambda: manual_stream(4, 1024)),
        ("man4 1MB", lambda: manual_stream(4, 512)),
        ("man8 512K", lambda: manual_stream(8, 256)),
    ]
    for name, fn in cases:
        t0 = time.time()
        try:
            bw = fn()
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s}: ERR {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        print(f"{name:10s}: {bw/1e9:6.0f} GB/s  [{time.time()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
