"""Inference export/load: self-describing model archives.

Parity: reference ``ModelExporter``/``ModelMetadata`` (Modeling/
ModelExporter.ixx) and ``InferenceEngine::load_model`` (Engine/
InferenceEngine.ixx:236-312 — aspirational there; real here). The archive
stores the architecture (model class + config, or a Sequential factory
spec) next to the weights, so ``load_exported`` reconstructs the module
without user code.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax.numpy as jnp

from mila_tpu.nn.module import Module, Sequential
from mila_tpu.serialization.archive import ModelArchive, OpenMode
from mila_tpu.serialization.checkpoint import to_device_tree
from mila_tpu.utils.registry import models as _models
from mila_tpu.version import __version__

_MODEL_CLASSES: dict[str, Any] = {}


def _model_registry() -> dict[str, Any]:
    if not _MODEL_CLASSES:
        from mila_tpu.models.gpt2 import GPT2, GPT2Config
        from mila_tpu.models.llama import Llama, LlamaConfig
        from mila_tpu.models.mlp_classifier import MLPClassifier, MLPClassifierConfig

        _MODEL_CLASSES.update(
            {
                "GPT2": (GPT2, GPT2Config),
                "Llama": (Llama, LlamaConfig),
                "MLPClassifier": (MLPClassifier, MLPClassifierConfig),
            }
        )
    return _MODEL_CLASSES


def export_model(path: str | Path, module: Module, params: Any) -> None:
    """Write a self-describing inference archive."""
    arch: dict[str, Any]
    cls_name = type(module).__name__
    if cls_name in _model_registry():
        arch = {"kind": "model", "class": cls_name, "config": module.config.to_dict()}
    elif isinstance(module, Sequential):
        from mila_tpu.nn.factory import network_to_spec

        arch = {"kind": "sequential", "spec": network_to_spec(module)}
    else:
        raise ValueError(
            f"cannot export architecture for {cls_name}; register it or use Sequential"
        )
    with ModelArchive(path, OpenMode.WRITE) as ar:
        ar.write_json(
            "model/meta.json",
            {"mode": "export", "framework_version": __version__},
        )
        ar.write_json("model/architecture.json", arch)
        ar.write_tree("params", params)


def load_exported(path: str | Path, dtype=None) -> tuple[Module, Any]:
    """Load an exported archive → (module, device params)."""
    with ModelArchive(path, OpenMode.READ) as ar:
        arch = ar.read_json("model/architecture.json")
        params = ar.read_tree("params")
    if arch["kind"] == "model":
        cls, cfg_cls = _model_registry()[arch["class"]]
        module = cls(cfg_cls.from_dict(arch["config"]))
    else:
        from mila_tpu.nn.factory import create_network

        module = create_network(arch["spec"])
    return module, to_device_tree(params, dtype=dtype)


class Predictor:
    """Minimal predict/predict_batch facade (InferenceEngine.ixx parity)."""

    def __init__(self, module: Module, params: Any):
        import jax

        self.module = module
        self.params = params
        self._fn = jax.jit(lambda p, x: module.apply(p, x))

    @classmethod
    def from_archive(cls, path: str | Path, dtype=None) -> "Predictor":
        return cls(*load_exported(path, dtype=dtype))

    def predict(self, x) -> Any:
        return self._fn(self.params, jnp.asarray(x)[None])[0]

    def predict_batch(self, x) -> Any:
        return self._fn(self.params, jnp.asarray(x))
