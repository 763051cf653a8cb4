"""MNIST dataset: IDX-file reader + deterministic synthetic fallback.

Parity: reference ``MnistDataLoader.ixx`` (reads IDX ubyte files, normalizes
to [0,1] floats, one-hot targets — we keep integer targets since the loss
takes ints on device). The synthetic fallback generates a learnable
10-class digit-like problem for environments without the real files (this
image has no MNIST data and no network egress); it is clearly labeled so
accuracy numbers aren't confused with real-MNIST results.
"""

from __future__ import annotations

import gzip
import os
import struct
from pathlib import Path
from typing import Optional

import numpy as np

from mila_tpu.data.loader import ArrayReader
from mila_tpu.utils.logging import Logger

IDX_IMAGE_MAGIC = 2051
IDX_LABEL_MAGIC = 2049

_FILES = {
    "train_images": ["train-images-idx3-ubyte", "train-images.idx3-ubyte"],
    "train_labels": ["train-labels-idx1-ubyte", "train-labels.idx1-ubyte"],
    "test_images": ["t10k-images-idx3-ubyte", "t10k-images.idx3-ubyte"],
    "test_labels": ["t10k-labels-idx1-ubyte", "t10k-labels.idx1-ubyte"],
}


def _open_maybe_gz(path: Path):
    if path.suffix == ".gz":
        return gzip.open(path, "rb")
    return open(path, "rb")


def read_idx_images(path: Path) -> np.ndarray:
    """Parse an IDX3 image file → [N, rows*cols] float32 in [0,1]."""
    if path.suffix != ".gz":
        from mila_tpu import native

        fast = native.read_idx_images(str(path))
        if fast is not None:
            return fast
    with _open_maybe_gz(path) as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        if magic != IDX_IMAGE_MAGIC:
            raise ValueError(f"{path}: bad IDX image magic {magic}")
        data = np.frombuffer(f.read(n * rows * cols), dtype=np.uint8)
    return (data.reshape(n, rows * cols).astype(np.float32)) / 255.0


def read_idx_labels(path: Path) -> np.ndarray:
    if path.suffix != ".gz":
        from mila_tpu import native

        fast = native.read_idx_labels(str(path))
        if fast is not None:
            return fast
    with _open_maybe_gz(path) as f:
        magic, n = struct.unpack(">II", f.read(8))
        if magic != IDX_LABEL_MAGIC:
            raise ValueError(f"{path}: bad IDX label magic {magic}")
        return np.frombuffer(f.read(n), dtype=np.uint8).astype(np.int32)


def _find(data_dir: Path, names: list[str]) -> Optional[Path]:
    for name in names:
        for cand in (data_dir / name, data_dir / (name + ".gz")):
            if cand.exists():
                return cand
    return None


def load_mnist(
    data_dir: Optional[str] = None, split: str = "train"
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Load real MNIST from IDX files if present, else None."""
    root = Path(data_dir or os.environ.get("MILA_TPU_DATA", "data"))
    for sub in (root, root / "mnist", root / "MNIST" / "raw"):
        img = _find(sub, _FILES[f"{split}_images"])
        lbl = _find(sub, _FILES[f"{split}_labels"])
        if img and lbl:
            return read_idx_images(img), read_idx_labels(lbl)
    return None


def synthetic_mnist(
    n: int = 12000, seed: int = 0, noise: float = 0.25
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic 10-class 28×28 surrogate: each class is a fixed random
    prototype blended with structured noise — linearly non-trivial but
    learnable to >97% by the reference MLP, exercising the same training
    dynamics as the real data.

    The class prototypes are FIXED (independent of ``seed``) so train/test
    splits drawn with different seeds share the same underlying task;
    ``seed`` only controls the label/noise draw.
    """
    proto_rng = np.random.default_rng(1234567)
    rng = np.random.default_rng(seed)
    protos = proto_rng.normal(0, 1, (10, 784)).astype(np.float32)
    # Localize prototypes like strokes: smooth across neighboring pixels.
    protos = protos.reshape(10, 28, 28)
    for _ in range(2):
        protos = (
            protos
            + np.roll(protos, 1, 1) + np.roll(protos, -1, 1)
            + np.roll(protos, 1, 2) + np.roll(protos, -1, 2)
        ) / 5.0
    protos = protos.reshape(10, 784)
    protos = (protos - protos.min(1, keepdims=True)) / (
        protos.max(1, keepdims=True) - protos.min(1, keepdims=True) + 1e-9
    )
    labels = rng.integers(0, 10, n).astype(np.int32)
    images = protos[labels] + rng.normal(0, noise, (n, 784)).astype(np.float32)
    return np.clip(images, 0.0, 1.0).astype(np.float32), labels


class MnistReader(ArrayReader):
    """Batched MNIST reader (MnistDataLoader.ixx parity).

    ``source`` is "real" (IDX files required), "synthetic", or "auto".
    """

    def __init__(
        self,
        batch_size: int,
        *,
        split: str = "train",
        data_dir: Optional[str] = None,
        source: str = "auto",
        synthetic_n: int = 12000,
        **kw,
    ):
        self.is_synthetic = False
        data = None
        if source in ("real", "auto"):
            data = load_mnist(data_dir, split)
            if data is None and source == "real":
                raise FileNotFoundError(
                    f"MNIST IDX files not found (looked under "
                    f"{data_dir or os.environ.get('MILA_TPU_DATA', 'data')})"
                )
        if data is None:
            self.is_synthetic = True
            seed = 0 if split == "train" else 1
            data = synthetic_mnist(synthetic_n if split == "train" else synthetic_n // 5,
                                   seed=seed)
            Logger.warning(
                "MNIST IDX files not found — using synthetic surrogate "
                "({} examples, split={})", len(data[0]), split
            )
        super().__init__(data[0], data[1], batch_size, **kw)
