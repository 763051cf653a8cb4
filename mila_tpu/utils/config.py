"""Config-object infrastructure: validated, json-round-trippable dataclasses.

Parity: reference CRTP fluent config base ``ComponentConfig``
(Mila/Src/Dnn/Core/ComponentConfig.ixx:31) and per-component configs
(LinearConfig.ixx, GeluConfig.ixx, AdamWConfig.ixx, ModelConfig.ixx).
TPU-native redesign: frozen dataclasses with ``validate()`` +
``to_json``/``from_json``; ``replace(**kw)`` plays the role of the fluent
``withX()`` setters.
"""

from __future__ import annotations

import dataclasses
import enum
import json
from typing import Any, Type, TypeVar

T = TypeVar("T", bound="BaseConfig")


class ConfigError(ValueError):
    """Raised when a config fails validation."""


@dataclasses.dataclass(frozen=True)
class BaseConfig:
    """Base class for all framework configs.

    Subclasses are frozen dataclasses. Override :meth:`validate` to check
    invariants; it is called explicitly by consumers (component ``__init__``),
    mirroring the reference's ``config.validate()`` contract.
    """

    name: str = ""

    def validate(self) -> None:
        """Raise :class:`ConfigError` if the config is invalid."""

    def replace(self: T, **kw: Any) -> T:
        """Functional update — the fluent-builder equivalent."""
        return dataclasses.replace(self, **kw)

    # --- json round-trip (ModelConfig.ixx json support parity) ---

    def to_dict(self) -> dict[str, Any]:
        def enc(v: Any) -> Any:
            if isinstance(v, enum.Enum):
                return v.name
            if dataclasses.is_dataclass(v) and not isinstance(v, type):
                return {f.name: enc(getattr(v, f.name)) for f in dataclasses.fields(v)}
            if isinstance(v, (list, tuple)):
                return [enc(x) for x in v]
            if isinstance(v, dict):
                return {k: enc(x) for k, x in v.items()}
            return v

        return {f.name: enc(getattr(self, f.name)) for f in dataclasses.fields(self)}

    def to_json(self, indent: int | None = None) -> str:
        return json.dumps(self.to_dict(), indent=indent)

    @classmethod
    def from_dict(cls: Type[T], d: dict[str, Any]) -> T:
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kw: dict[str, Any] = {}
        for k, v in d.items():
            if k not in fields:
                continue  # forward-compatible: ignore unknown keys
            ftype = fields[k].type
            # Decode enums stored by name.
            resolved = _resolve_type(ftype, cls)
            if isinstance(resolved, type) and issubclass(resolved, enum.Enum) and isinstance(v, str):
                v = resolved[v]
            elif (
                isinstance(resolved, type)
                and dataclasses.is_dataclass(resolved)
                and isinstance(v, dict)
            ):
                v = resolved.from_dict(v) if issubclass(resolved, BaseConfig) else resolved(**v)
            elif isinstance(v, list):
                v = tuple(v) if _wants_tuple(ftype) else v
            kw[k] = v
        return cls(**kw)

    @classmethod
    def from_json(cls: Type[T], s: str) -> T:
        return cls.from_dict(json.loads(s))


def _resolve_type(tp: Any, owner: type) -> Any:
    """Best-effort resolution of a dataclass field type annotation."""
    if isinstance(tp, str):
        import sys
        import typing

        mod = sys.modules.get(owner.__module__)
        ns = dict(vars(typing))
        if mod is not None:
            ns.update(vars(mod))
        try:
            tp = eval(tp, ns)  # noqa: S307 - annotations from our own modules
        except Exception:
            return None
    origin = getattr(tp, "__origin__", None)
    if origin is not None:
        # Optional[X] / Union — take first non-None arg.
        args = [a for a in getattr(tp, "__args__", ()) if a is not type(None)]
        if args:
            return _resolve_type(args[0], owner)
        return None
    return tp


def _wants_tuple(tp: Any) -> bool:
    s = str(tp)
    return "tuple" in s or "Tuple" in s
