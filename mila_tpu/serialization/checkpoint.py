"""Checkpoint save/resume/export.

Parity: reference ``CheckpointManager``/``CheckpointMetadata``
(Modeling/Checkpoints/CheckpointManager.ixx, CheckpointMetaData.ixx:
filename generation, latest-checkpoint discovery) and the Model save path
(Model.ixx:470-533: network_->save + optimizer/ + model/meta.json +
model/config.json). Layout inside the archive:

    model/meta.json        {epoch, losses, timestamp, framework_version, mode}
    model/config.json      model config (json round-trip)
    params/...             parameter pytree blobs
    optimizer/...          optimizer-state pytree blobs (checkpoint mode only)
    history.json           TrainingHistory
"""

from __future__ import annotations

import dataclasses
import re
import time
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp

from mila_tpu.serialization.archive import (
    ModelArchive,
    OpenMode,
    SerializationMode,
)
from mila_tpu.utils.logging import Logger
from mila_tpu.version import __version__


@dataclasses.dataclass
class CheckpointMetadata:
    """CheckpointMetaData.ixx parity."""

    epoch: int = 0
    step: int = 0
    train_loss: float = 0.0
    val_loss: float = 0.0
    timestamp: float = 0.0
    filepath: str = ""


def generate_checkpoint_filename(prefix: str, epoch: int) -> str:
    return f"{prefix}_epoch{epoch:04d}.mila"


def find_latest_checkpoint(directory: str | Path, prefix: str = "") -> Optional[Path]:
    """Latest-checkpoint discovery (CheckpointManager parity)."""
    directory = Path(directory)
    if not directory.exists():
        return None
    pat = re.compile(rf"{re.escape(prefix)}.*_epoch(\d+)\.mila$")
    best, best_epoch = None, -1
    for p in directory.iterdir():
        m = pat.match(p.name)
        if m and int(m.group(1)) > best_epoch:
            best, best_epoch = p, int(m.group(1))
    return best


def save_checkpoint(
    path: str | Path,
    params: Any,
    *,
    opt_state: Any = None,
    model_config: Any = None,
    metadata: Optional[CheckpointMetadata] = None,
    history: Any = None,
    mode: SerializationMode = SerializationMode.CHECKPOINT,
) -> None:
    meta = metadata or CheckpointMetadata()
    meta.timestamp = meta.timestamp or time.time()
    with ModelArchive(path, OpenMode.WRITE) as ar:
        ar.write_json(
            "model/meta.json",
            {
                **dataclasses.asdict(meta),
                "framework_version": __version__,
                "mode": mode.value,
            },
        )
        if model_config is not None:
            cfg = model_config.to_dict() if hasattr(model_config, "to_dict") else model_config
            ar.write_json("model/config.json", cfg)
        ar.write_tree("params", params)
        if opt_state is not None and mode == SerializationMode.CHECKPOINT:
            # NamedTuple states (AdamWState) serialize as their dict form.
            tree = opt_state._asdict() if hasattr(opt_state, "_asdict") else opt_state
            # step is a scalar array; master may be None.
            ar.write_tree("optimizer", tree)
        if history is not None:
            h = dataclasses.asdict(history) if dataclasses.is_dataclass(history) else history
            ar.write_json("history.json", h)
    Logger.debug("checkpoint saved to {}", path)


def load_checkpoint(path: str | Path) -> dict:
    """Returns {meta, config, params, optimizer, history} (missing → None)."""
    with ModelArchive(path, OpenMode.READ) as ar:
        out: dict[str, Any] = {
            "meta": ar.read_json("model/meta.json"),
            "config": ar.read_json("model/config.json") if ar.exists("model/config.json") else None,
            "params": ar.read_tree("params"),
            "optimizer": None,
            "history": ar.read_json("history.json") if ar.exists("history.json") else None,
        }
        if ar.exists("optimizer/__index__.json"):
            out["optimizer"] = ar.read_tree("optimizer")
    return out


def to_device_tree(tree: Any, dtype=None) -> Any:
    """numpy pytree → jax arrays (optionally casting float leaves)."""

    def put(x):
        a = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        return a

    return jax.tree_util.tree_map(put, tree)
