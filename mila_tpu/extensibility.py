"""Plugin system: discover and load extension modules.

Parity: reference ``PluginManager`` (Extensibility/PluginManager.ixx:30 —
dlopen/LoadLibrary scanning a plugin directory) and ``IModulePlugin``
(IModulePlugin.ixx:27). TPU-native redesign: python-module plugins — a
plugin is any module exposing ``MILA_TPU_PLUGIN`` (an object implementing
the :class:`ModulePlugin` protocol); discovery scans directories and
``mila_tpu_plugins`` entry points. Plugins typically register components/
operations/models into the framework registries on load.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
from pathlib import Path
from typing import Optional, Protocol, runtime_checkable

from mila_tpu.utils.logging import Logger


@runtime_checkable
class ModulePlugin(Protocol):
    """Plugin contract (IModulePlugin.ixx:27 parity)."""

    name: str
    version: str

    def initialize(self) -> None:  # register components/ops/models
        ...

    def shutdown(self) -> None:
        ...


class PluginManager:
    """Load/track/unload plugins (PluginManager.ixx parity)."""

    def __init__(self):
        self._plugins: dict[str, ModulePlugin] = {}

    def load_from_module(self, module_name: str) -> ModulePlugin:
        mod = importlib.import_module(module_name)
        return self._register(mod, module_name)

    def load_from_path(self, path: str | Path) -> ModulePlugin:
        path = Path(path)
        spec = importlib.util.spec_from_file_location(path.stem, path)
        if spec is None or spec.loader is None:
            raise ImportError(f"cannot load plugin from {path}")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[path.stem] = mod
        spec.loader.exec_module(mod)
        return self._register(mod, str(path))

    def _register(self, mod, origin: str) -> ModulePlugin:
        plugin = getattr(mod, "MILA_TPU_PLUGIN", None)
        if plugin is None:
            raise ImportError(f"{origin} does not export MILA_TPU_PLUGIN")
        if not isinstance(plugin, ModulePlugin):
            raise TypeError(f"{origin}: MILA_TPU_PLUGIN does not satisfy ModulePlugin")
        if plugin.name in self._plugins:
            raise KeyError(f"plugin '{plugin.name}' already loaded")
        plugin.initialize()
        self._plugins[plugin.name] = plugin
        Logger.info("loaded plugin {} v{}", plugin.name, plugin.version)
        return plugin

    def scan_directory(self, directory: str | Path) -> list[ModulePlugin]:
        loaded = []
        d = Path(directory)
        if not d.is_dir():
            return loaded
        for p in sorted(d.glob("*.py")):
            try:
                loaded.append(self.load_from_path(p))
            except (ImportError, TypeError, KeyError) as e:
                Logger.warning("skipping plugin {}: {}", p.name, e)
        return loaded

    def get(self, name: str) -> Optional[ModulePlugin]:
        return self._plugins.get(name)

    def list_plugins(self) -> list[str]:
        return sorted(self._plugins)

    def unload(self, name: str) -> None:
        plugin = self._plugins.pop(name)
        plugin.shutdown()

    def unload_all(self) -> None:
        for name in list(self._plugins):
            self.unload(name)
