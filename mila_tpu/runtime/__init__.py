"""Device, precision, and memory runtime.

Parity: reference layer 1 (``Mila/Src/Dnn/Compute/``, SURVEY.md §2.1).
"""

from mila_tpu.runtime.device import (
    DeviceKind,
    DeviceProps,
    ExecutionContext,
    available_platforms,
    default_context,
    get_device,
    list_devices,
    set_default_context,
)
from mila_tpu.runtime.memory import (
    MemoryStats,
    MemoryTracker,
    device_memory_stats,
    format_bytes,
    tree_nbytes,
)
from mila_tpu.runtime.precision import PrecisionPolicy, ResolvedPrecision, resolve

__all__ = [
    "DeviceKind",
    "DeviceProps",
    "ExecutionContext",
    "available_platforms",
    "default_context",
    "get_device",
    "list_devices",
    "set_default_context",
    "MemoryStats",
    "MemoryTracker",
    "device_memory_stats",
    "format_bytes",
    "tree_nbytes",
    "PrecisionPolicy",
    "ResolvedPrecision",
    "resolve",
]
