"""Component factory: build modules from (name, config-dict) descriptions.

Parity: reference ``ComponentFactory`` (Core/ComponentFactory.ixx:47) and
``NetworkFactory`` (Network/NetworkFactory.ixx). Enables config-file-driven
model construction and archive-config round trips.
"""

from __future__ import annotations

from typing import Any

from mila_tpu.nn import blocks as _blocks
from mila_tpu.nn import layers as _layers
from mila_tpu.nn.module import Module, Sequential
from mila_tpu.utils.registry import components as _components

_BUILTINS = {
    "Linear": (_layers.Linear, _layers.LinearConfig),
    "Gelu": (_layers.Gelu, _layers.GeluConfig),
    "LayerNorm": (_layers.LayerNorm, _layers.LayerNormConfig),
    "RMSNorm": (_layers.RMSNorm, _layers.LayerNormConfig),
    "Attention": (_layers.Attention, _layers.AttentionConfig),
    "Encoder": (_layers.Encoder, _layers.EncoderConfig),
    "Softmax": (_layers.Softmax, _layers.SoftmaxConfig),
    "Dropout": (_layers.Dropout, _layers.DropoutConfig),
    "SoftmaxCrossEntropy": (_layers.SoftmaxCrossEntropy, _layers.SoftmaxCrossEntropyConfig),
    "MLP": (_blocks.MLP, _blocks.MLPConfig),
    "TransformerBlock": (_blocks.TransformerBlock, _blocks.TransformerBlockConfig),
}

for _name, (_cls, _cfg) in _BUILTINS.items():
    if not _components.contains(_name):
        _components.register(_name, (_cls, _cfg))


def create_component(type_name: str, config: dict[str, Any] | None = None) -> Module:
    """Instantiate a registered component from a config dict."""
    cls, cfg_cls = _components.get(type_name)
    cfg = cfg_cls.from_dict(config or {})
    return cls(cfg)


def create_network(spec: list[dict[str, Any]], name: str = "network") -> Sequential:
    """Build a Sequential network from a list of layer specs:
    ``[{"type": "Linear", "name": "fc1", "config": {...}}, ...]``
    (NetworkFactory parity — json-driven model assembly)."""
    net = Sequential()
    for i, entry in enumerate(spec):
        type_name = entry["type"]
        child_name = entry.get("name", f"{type_name.lower()}{i}")
        net.add(child_name, create_component(type_name, entry.get("config")))
    return net


def network_to_spec(net: Sequential) -> list[dict[str, Any]]:
    """Inverse of :func:`create_network` for archive round trips."""
    out = []
    for name, child in net.children():
        out.append(
            {
                "type": type(child).__name__,
                "name": name,
                "config": child.config.to_dict(),
            }
        )
    return out
