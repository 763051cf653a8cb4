"""Serialization layer (reference layer 7, SURVEY.md §2.8)."""

from mila_tpu.serialization.archive import (
    ModelArchive,
    OpenMode,
    SerializationMode,
)
from mila_tpu.serialization.checkpoint import (
    CheckpointMetadata,
    find_latest_checkpoint,
    generate_checkpoint_filename,
    load_checkpoint,
    save_checkpoint,
    to_device_tree,
)

__all__ = [
    "ModelArchive",
    "OpenMode",
    "SerializationMode",
    "CheckpointMetadata",
    "find_latest_checkpoint",
    "generate_checkpoint_filename",
    "load_checkpoint",
    "save_checkpoint",
    "to_device_tree",
]
