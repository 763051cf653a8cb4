"""Memory observability: allocation stats and HBM usage tracking.

Parity: reference ``TrackedMemoryResource``/``MemoryStats``
(Compute/MemoryResourceTracker.ixx:19-71) — alloc count, bytes, peak. On TPU,
XLA owns the allocator, so tracking is (a) live device memory stats from the
runtime, (b) a host-side tracker for pytrees we materialize (params,
optimizer state, KV caches), giving the same count/bytes/peak numbers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np


@dataclasses.dataclass
class MemoryStats:
    """Alloc statistics (MemoryResourceTracker.ixx:19 parity)."""

    allocation_count: int = 0
    deallocation_count: int = 0
    bytes_allocated: int = 0
    bytes_deallocated: int = 0
    peak_bytes: int = 0

    @property
    def live_bytes(self) -> int:
        return self.bytes_allocated - self.bytes_deallocated


class MemoryTracker:
    """Host-side tracker for framework-managed arrays/pytrees."""

    def __init__(self):
        self.stats = MemoryStats()

    def record_alloc(self, tree: Any) -> int:
        nbytes = tree_nbytes(tree)
        self.stats.allocation_count += sum(
            1 for _ in jax.tree_util.tree_leaves(tree)
        )
        self.stats.bytes_allocated += nbytes
        self.stats.peak_bytes = max(self.stats.peak_bytes, self.stats.live_bytes)
        return nbytes

    def record_free(self, tree: Any) -> int:
        nbytes = tree_nbytes(tree)
        self.stats.deallocation_count += sum(
            1 for _ in jax.tree_util.tree_leaves(tree)
        )
        self.stats.bytes_deallocated += nbytes
        return nbytes

    def reset(self) -> None:
        self.stats = MemoryStats()


def array_nbytes(x: Any) -> int:
    """Bytes of one array, honoring sub-byte packed dtypes."""
    if hasattr(x, "nbytes"):
        return int(x.nbytes)
    if hasattr(x, "size") and hasattr(x, "dtype"):
        return int(x.size) * np.dtype(x.dtype).itemsize
    return 0


def tree_nbytes(tree: Any) -> int:
    """Total bytes across a pytree of arrays."""
    return sum(array_nbytes(leaf) for leaf in jax.tree_util.tree_leaves(tree))


def device_memory_stats(device: Optional[jax.Device] = None) -> Optional[dict]:
    """Live allocator stats from the device runtime (HBM usage on TPU)."""
    dev = device or jax.devices()[0]
    try:
        return dev.memory_stats()
    except Exception:
        return None


def format_bytes(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(n) < 1024 or unit == "TiB":
            return f"{n:.2f} {unit}"
        n /= 1024
    return f"{n:.2f} TiB"
