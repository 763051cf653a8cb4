"""Generic name→factory registry.

Parity: reference ``OperationRegistry`` (Compute/Operations/OperationRegistry.ixx:44)
and ``DeviceRegistry`` (Registry/DeviceRegistry.ixx:40). TPU-native redesign: one
generic registry class; ops are plain functions so the registry stores callables
keyed by (name, variant) where variant plays the role of the reference's
``TypeID{device, dtype, precision}`` specialization key.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Generic, Hashable, Optional, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    """Thread-safe name→factory registry with optional variant keys."""

    def __init__(self, kind: str):
        self._kind = kind
        self._lock = threading.Lock()
        self._entries: dict[tuple[str, Hashable], T] = {}

    def register(
        self, name: str, value: T, variant: Hashable = None, overwrite: bool = False
    ) -> None:
        key = (name, variant)
        with self._lock:
            if key in self._entries and not overwrite:
                raise KeyError(f"{self._kind} '{name}' (variant={variant}) already registered")
            self._entries[key] = value

    def get(self, name: str, variant: Hashable = None) -> T:
        with self._lock:
            key = (name, variant)
            if key in self._entries:
                return self._entries[key]
            # Fall back to the default variant, mirroring the reference's
            # fallback from specialized to generic op registrations.
            if variant is not None and (name, None) in self._entries:
                return self._entries[(name, None)]
        raise KeyError(
            f"no {self._kind} named '{name}' (variant={variant}); "
            f"registered: {sorted({n for n, _ in self._entries})}"
        )

    def contains(self, name: str, variant: Hashable = None) -> bool:
        with self._lock:
            return (name, variant) in self._entries or (name, None) in self._entries

    def names(self) -> list[str]:
        with self._lock:
            return sorted({n for n, _ in self._entries})

    def decorator(self, name: Optional[str] = None, variant: Hashable = None) -> Callable:
        """Use as ``@registry.decorator("OpName")`` on a function/class."""

        def deco(obj: Any) -> Any:
            self.register(name or obj.__name__, obj, variant=variant)
            return obj

        return deco


# Framework-wide registries (populated by module import side effects in
# mila_tpu.initialize(), the OperationsRegistrar analogue).
operations: Registry[Callable] = Registry("operation")
components: Registry[type] = Registry("component")
models: Registry[type] = Registry("model")
datasets: Registry[type] = Registry("dataset")
