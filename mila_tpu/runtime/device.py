"""Device discovery and execution-context runtime.

Parity: reference device layer (SURVEY.md §2.1): ``ComputeDevice``
(Compute/ComputeDevice.ixx:30), ``DeviceType`` (DeviceType.ixx:21),
``DeviceRegistry`` ("CPU"/"CUDA:0" name→device, Registry/DeviceRegistry.ixx:40),
``ExecutionContext<TDeviceType>`` (ExecutionContext.ixx:39). TPU-native
redesign: jax already owns device enumeration and async dispatch, so the
runtime here is (a) a device-spec parser resolving names like "tpu:0"/"cpu",
(b) an ``ExecutionContext`` that bundles device/mesh + precision policy +
default shardings — the thing components receive instead of a CUDA stream.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Sequence

import jax
import numpy as np

from mila_tpu.runtime.precision import PrecisionPolicy
from mila_tpu.utils.logging import Logger


class DeviceKind(enum.Enum):
    """Accelerator families (DeviceType.ixx:21 parity; TPU replaces CUDA)."""

    CPU = "cpu"
    TPU = "tpu"
    GPU = "gpu"

    @staticmethod
    def from_string(s: str) -> "DeviceKind":
        key = s.strip().lower()
        aliases = {"cuda": "gpu", "auto": "tpu"}
        key = aliases.get(key, key)
        for k in DeviceKind:
            if k.value == key:
                return k
        raise ValueError(f"unknown device kind '{s}'")


def available_platforms() -> list[str]:
    plats = []
    for d in jax.devices():
        if d.platform not in plats:
            plats.append(d.platform)
    return plats


def list_devices(kind: Optional[DeviceKind] = None) -> list[jax.Device]:
    """Enumerate devices (DeviceRegistry::listDevices parity)."""
    if kind is None:
        return list(jax.devices())
    try:
        return list(jax.devices(kind.value))
    except RuntimeError:
        return []


def get_device(spec: str = "auto") -> jax.Device:
    """Resolve a device name like "tpu", "tpu:1", "cpu", "auto".

    Parity: ``DeviceRegistry::getDevice("CUDA:0")`` (DeviceRegistry.ixx:40).
    "auto" prefers TPU > GPU > CPU.
    """
    spec = spec.strip().lower()
    if spec in ("", "auto"):
        for platform in ("tpu", "axon", "gpu", "cpu"):
            try:
                devs = jax.devices(platform)
            except RuntimeError:
                continue
            if devs:
                return devs[0]
        return jax.devices()[0]
    if ":" in spec:
        plat, _, idx_s = spec.partition(":")
        idx = int(idx_s)
    else:
        plat, idx = spec, 0
    plat = {"cuda": "gpu"}.get(plat, plat)
    try:
        devs = jax.devices(plat)
    except RuntimeError as e:
        raise ValueError(f"no '{plat}' devices available: {e}") from None
    if idx >= len(devs):
        raise ValueError(f"device index {idx} out of range; {len(devs)} '{plat}' device(s)")
    return devs[idx]


@dataclasses.dataclass(frozen=True)
class DeviceProps:
    """Static properties of a device (CudaDeviceProps.ixx:39-115 parity)."""

    platform: str
    id: int
    kind: str
    process_index: int
    num_cores: int
    memory_bytes: Optional[int]

    @staticmethod
    def query(device: jax.Device) -> "DeviceProps":
        mem = None
        try:
            stats = device.memory_stats()
            if stats:
                mem = stats.get("bytes_limit")
        except Exception:
            pass
        return DeviceProps(
            platform=device.platform,
            id=device.id,
            kind=getattr(device, "device_kind", device.platform),
            process_index=device.process_index,
            num_cores=getattr(device, "num_cores", 1) or 1,
            memory_bytes=mem,
        )


class ExecutionContext:
    """Per-device (or per-mesh) execution environment handed to components.

    Parity: ``ExecutionContext<TDeviceType>`` (Compute/ExecutionContext.ixx:39)
    + ``CudaExecutionContext`` stream/handle ownership
    (CudaExecutionContext.ixx:37-266). On TPU there is no user-visible stream:
    XLA dispatches asynchronously; ``synchronize()`` maps to blocking on ready
    arrays. The context instead carries the mesh (if any) and precision policy
    that jitted programs should use.
    """

    def __init__(
        self,
        device: jax.Device | str = "auto",
        mesh: Optional[jax.sharding.Mesh] = None,
        precision: PrecisionPolicy = PrecisionPolicy.AUTO,
    ):
        self._device = get_device(device) if isinstance(device, str) else device
        self._mesh = mesh
        self._precision = precision

    @property
    def device(self) -> jax.Device:
        return self._device

    @property
    def mesh(self) -> Optional[jax.sharding.Mesh]:
        return self._mesh

    @property
    def precision(self) -> PrecisionPolicy:
        return self._precision

    @property
    def is_accelerator(self) -> bool:
        return self._device.platform != "cpu"

    def props(self) -> DeviceProps:
        return DeviceProps.query(self._device)

    def put(self, x, sharding=None):
        """Place an array on this context's device (or sharding)."""
        return jax.device_put(x, sharding if sharding is not None else self._device)

    def synchronize(self, *arrays) -> None:
        """Block until outstanding work on the given arrays (or all work) completes.

        Parity: ``ExecutionContext::synchronize()`` (ExecutionContext.ixx).
        """
        if arrays:
            for a in jax.tree_util.tree_leaves(arrays):
                if hasattr(a, "block_until_ready"):
                    a.block_until_ready()
        else:
            # Barrier across the device: submit and wait on a trivial op.
            jax.device_put(np.zeros((), np.float32), self._device).block_until_ready()

    def __repr__(self) -> str:
        return (
            f"ExecutionContext(device={self._device}, mesh={self._mesh}, "
            f"precision={self._precision.name})"
        )


_default_context: Optional[ExecutionContext] = None


def default_context() -> ExecutionContext:
    global _default_context
    if _default_context is None:
        _default_context = ExecutionContext("auto")
        Logger.debug("default ExecutionContext on {}", _default_context.device)
    return _default_context


def set_default_context(ctx: ExecutionContext) -> None:
    global _default_context
    _default_context = ctx
