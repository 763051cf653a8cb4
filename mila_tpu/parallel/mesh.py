"""Device-mesh construction and axis conventions.

Parity: reference §2.10 — the reference has NO implemented parallelism (only
unused rank/num_processes in Gpt2DataLoader.ixx:72-79); this module supplies
the TPU-native design: a named ``jax.sharding.Mesh`` with axes

  * ``data``  — batch (DP) axis; gradients all-reduce over it,
  * ``model`` — tensor-parallel (TP) axis; weights/KV heads shard over it.

Within a slice the axes ride ICI; across slices ``data`` should map to DCN
(mesh axis ordering puts ``data`` outermost for that reason).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = 0,
    model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a 2-D (data, model) mesh. ``data=0`` → use all remaining devices.

    On multi-host, uses the global device list (each process sees its local
    shard of any global array, standard jax.distributed SPMD).
    """
    devs = list(devices) if devices is not None else list(jax.devices())
    n = len(devs)
    if model <= 0:
        raise ValueError("model axis size must be >= 1")
    if data <= 0:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    grid = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names)


def single_device_mesh(device: Optional[jax.Device] = None) -> Mesh:
    dev = device or jax.devices()[0]
    return Mesh(np.asarray([dev]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS))


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    """Shorthand: sharding(mesh, 'data', None) → NamedSharding(P('data', None))."""
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    d = mesh.shape[DATA_AXIS]
    if global_batch % d != 0:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {d}")
    return global_batch // d
