"""ctypes binding for the native IO library (native/libmila_io.so).

Parity: the reference's data layer is native C++ (DatasetLoader.ixx,
MnistDataLoader.ixx, Gpt2DataLoader.ixx); this binds our C++ equivalent.
The library builds on demand with ``make``; every entry point has a numpy
fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from mila_tpu.utils.logging import Logger

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libmila_io.so"

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_build() -> bool:
    if not (_NATIVE_DIR / "Makefile").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            capture_output=True,
            check=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except (subprocess.SubprocessError, OSError) as e:
        Logger.debug("native build failed: {}", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists() and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        Logger.warning("could not load native IO library: {}", e)
        return None
    i64, i32p, i64p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.mila_read_idx_images.restype = i64
    lib.mila_read_idx_images.argtypes = [ctypes.c_char_p, f32p, i64, i32p, i32p]
    lib.mila_read_idx_labels.restype = i64
    lib.mila_read_idx_labels.argtypes = [ctypes.c_char_p, i32p, i64]
    lib.mila_read_token_file.restype = i64
    lib.mila_read_token_file.argtypes = [ctypes.c_char_p, i32p, i64]
    lib.mila_gather_windows.restype = None
    lib.mila_gather_windows.argtypes = [
        i32p, i64, i64p, ctypes.c_int32, ctypes.c_int32, i32p, i32p,
    ]
    lib.mila_lut_encode.restype = None
    lib.mila_lut_encode.argtypes = [u8p, i64, i32p, i32p]
    lib.mila_io_version.restype = ctypes.c_int
    _lib = lib
    Logger.debug("native IO library loaded (v{})", lib.mila_io_version())
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def read_token_file(path: str) -> Optional[np.ndarray]:
    """Native token-shard read; None → caller should use the python path."""
    lib = get_lib()
    if lib is None:
        return None
    size = Path(path).stat().st_size
    cap = max(size // 2 + 16, 1024)
    out = np.empty(cap, np.int32)
    n = lib.mila_read_token_file(
        str(path).encode(), _ptr(out, ctypes.c_int32), cap
    )
    if n < 0:
        return None
    return out[:n].copy()


def read_idx_images(path: str) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    size = Path(path).stat().st_size
    cap_pixels = max(size, 1024)
    out = np.empty(cap_pixels, np.float32)
    rows = ctypes.c_int32(0)
    cols = ctypes.c_int32(0)
    n = lib.mila_read_idx_images(
        str(path).encode(), _ptr(out, ctypes.c_float), cap_pixels,
        ctypes.byref(rows), ctypes.byref(cols),
    )
    if n < 0:
        return None
    stride = rows.value * cols.value
    return out[: n * stride].reshape(n, stride).copy()


def read_idx_labels(path: str) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    size = Path(path).stat().st_size
    out = np.empty(max(size, 16), np.int32)
    n = lib.mila_read_idx_labels(str(path).encode(), _ptr(out, ctypes.c_int32), out.size)
    if n < 0:
        return None
    return out[:n].copy()


def gather_windows(
    tokens: np.ndarray, starts: np.ndarray, seq_len: int
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Native (x, y) next-token window gather; None → python fallback."""
    lib = get_lib()
    if lib is None:
        return None
    tokens = np.ascontiguousarray(tokens, np.int32)
    starts64 = np.ascontiguousarray(starts, np.int64)
    B = len(starts64)
    x = np.empty((B, seq_len), np.int32)
    y = np.empty((B, seq_len), np.int32)
    lib.mila_gather_windows(
        _ptr(tokens, ctypes.c_int32), tokens.size,
        _ptr(starts64, ctypes.c_int64), B, seq_len,
        _ptr(x, ctypes.c_int32), _ptr(y, ctypes.c_int32),
    )
    return x, y


def lut_encode(data: bytes | np.ndarray, lut256: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) else np.ascontiguousarray(data, np.uint8)
    lut = np.ascontiguousarray(lut256, np.int32)
    out = np.empty(buf.size, np.int32)
    lib.mila_lut_encode(
        _ptr(buf, ctypes.c_uint8), buf.size, _ptr(lut, ctypes.c_int32),
        _ptr(out, ctypes.c_int32),
    )
    return out
