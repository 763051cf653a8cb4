"""Path-addressed zip archive with json + raw tensor blobs.

Parity: reference ``ModelArchive`` (Serialization/ModelArchive.ixx),
``ZipSerializer`` (ZipSerializer.ixx:39 — miniz zip, addData/extractData,
normalized paths), ``TensorMetadata`` (Tensor.Serialization.ixx:31-38:
dtype, shape, byte_size, layout, byte_order) and serialization modes
(SerializationMode.ixx, OpenMode.ixx). Format: little-endian row-major blobs
at ``<path>.bin`` with sidecar ``<path>.json`` metadata; pytrees nest by
path segments, so a whole params dict round-trips losslessly.
"""

from __future__ import annotations

import enum
import io
import json
import zipfile
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

from mila_tpu.tensor import dtypes as _dt


class OpenMode(enum.Enum):
    READ = "r"
    WRITE = "w"


class SerializationMode(enum.Enum):
    CHECKPOINT = "checkpoint"  # full training state
    EXPORT = "export"  # inference-only weights


def _normalize(path: str) -> str:
    parts = [p for p in path.replace("\\", "/").split("/") if p and p != "."]
    if any(p == ".." for p in parts):
        raise ValueError(f"path escapes archive: {path}")
    return "/".join(parts)


class ModelArchive:
    """Zip-backed archive: ``write_json``/``read_json`` + tensor blobs."""

    def __init__(self, path: str | Path, mode: OpenMode = OpenMode.READ):
        self.path = Path(path)
        self.mode = mode
        self._zf = zipfile.ZipFile(
            self.path, mode.value, compression=zipfile.ZIP_DEFLATED
        )

    # --- json ---

    def write_json(self, path: str, obj: Any) -> None:
        self._zf.writestr(_normalize(path), json.dumps(obj, indent=1))

    def read_json(self, path: str) -> Any:
        return json.loads(self._zf.read(_normalize(path)))

    # --- raw blobs ---

    def write_bytes(self, path: str, data: bytes) -> None:
        self._zf.writestr(_normalize(path), data)

    def read_bytes(self, path: str) -> bytes:
        return self._zf.read(_normalize(path))

    def exists(self, path: str) -> bool:
        try:
            self._zf.getinfo(_normalize(path))
            return True
        except KeyError:
            return False

    def list(self, prefix: str = "") -> list[str]:
        prefix = _normalize(prefix) + "/" if prefix else ""
        return sorted(
            n for n in self._zf.namelist() if n.startswith(prefix)
        )

    # --- tensors (TensorMetadata parity) ---

    def write_tensor(self, path: str, array) -> None:
        arr = np.asarray(jax.device_get(array))
        name = _dt.from_jnp(arr.dtype).name if _has_abstract(arr.dtype) else str(arr.dtype)
        meta = {
            "dtype": name,
            "shape": list(arr.shape),
            "byte_size": int(arr.nbytes),
            "layout": "row_major",
            "byte_order": "little",
        }
        buf = arr.astype(arr.dtype.newbyteorder("<")) if arr.dtype.byteorder == ">" else arr
        self.write_json(path + ".json", meta)
        self.write_bytes(path + ".bin", np.ascontiguousarray(buf).tobytes())

    def read_tensor(self, path: str) -> np.ndarray:
        meta = self.read_json(path + ".json")
        raw = self.read_bytes(path + ".bin")
        try:
            np_dtype = np.dtype(_dt.from_name(meta["dtype"]).jnp_dtype)
        except KeyError:
            np_dtype = np.dtype(meta["dtype"])
        arr = np.frombuffer(raw, dtype=np_dtype)
        return arr.reshape(meta["shape"]).copy()

    # --- pytrees ---

    def write_tree(self, prefix: str, tree: Any) -> None:
        """Write a nested dict/list pytree of arrays under ``prefix``."""
        paths = _flatten_paths(tree)
        index = []
        for keypath, leaf in paths:
            p = f"{prefix}/{keypath}"
            self.write_tensor(p, leaf)
            index.append(keypath)
        self.write_json(f"{prefix}/__index__.json", index)

    def read_tree(self, prefix: str) -> dict:
        index = self.read_json(f"{prefix}/__index__.json")
        out: dict = {}
        for keypath in index:
            arr = self.read_tensor(f"{prefix}/{keypath}")
            _set_path(out, keypath.split("/"), arr)
        return out

    def close(self) -> None:
        self._zf.close()

    def __enter__(self) -> "ModelArchive":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def _has_abstract(dtype) -> bool:
    try:
        _dt.from_jnp(dtype)
        return True
    except KeyError:
        return False


def _flatten_paths(tree: Any, prefix: str = "") -> list[tuple[str, Any]]:
    out: list[tuple[str, Any]] = []
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.extend(_flatten_paths(tree[k], f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.extend(_flatten_paths(v, f"{prefix}{i}/"))
    elif tree is None:
        pass
    else:
        out.append((prefix[:-1], tree))
    return out


def _set_path(d: dict, keys: list[str], value: Any) -> None:
    for k in keys[:-1]:
        d = d.setdefault(k, {})
    d[keys[-1]] = value
