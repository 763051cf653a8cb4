"""Functional module (component) system.

Parity: reference ``Component<TDevice,TPrecision>`` (Core/Component.ixx:45)
and ``CompositeComponent`` (Core/CompositeComponent.ixx:55): named children,
build-time shape propagation, parameter/gradient aggregation, training-mode
lifecycle, recursive save. TPU-native redesign: modules are stateless config
objects; parameters live in a nested-dict pytree keyed by child name (the
CompositeComponent tree becomes the pytree structure). ``init`` plays the
role of ``build`` (shape propagation + parameter allocation), ``apply`` the
role of ``forward``; backward is ``jax.grad`` through the ops' manual VJPs —
reproducing Mila's hand-written backward chain without hand-chaining.
Training-mode is an ``apply(..., training=True)`` argument instead of a
stateful flag (no mutex needed; XLA traces both variants separately).
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp

from mila_tpu.utils.config import BaseConfig
from mila_tpu.utils.rng import split_named

Params = dict  # nested dict pytree: child name → subtree | array


class Module:
    """Base class for all NN components.

    Subclasses implement:
      * ``init(key, input_shape) -> Params`` — allocate parameters given the
        input shape (build-time shape propagation, Component::build parity).
      * ``apply(params, x, *, training=False, rngs=None) -> y`` — forward.
      * ``output_shape(input_shape) -> shape`` — static shape inference.
    """

    config: BaseConfig

    def __init__(self, config: Optional[BaseConfig] = None):
        self.config = config if config is not None else BaseConfig()
        self.config.validate()

    @property
    def name(self) -> str:
        return self.config.name or type(self).__name__

    # --- to be overridden ---

    def init(self, key: jax.Array, input_shape: Sequence[int]) -> Params:
        return {}

    def apply(
        self,
        params: Params,
        x: jax.Array,
        *,
        training: bool = False,
        rngs: Optional[dict[str, jax.Array]] = None,
    ) -> jax.Array:
        raise NotImplementedError

    def output_shape(self, input_shape: Sequence[int]) -> tuple[int, ...]:
        return tuple(input_shape)

    # --- common services (Component.ixx parameterCount/getParameters parity) ---

    def parameter_count(self, params: Params) -> int:
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))

    def parameter_bytes(self, params: Params) -> int:
        from mila_tpu.runtime.memory import tree_nbytes

        return tree_nbytes(params)

    def __call__(self, params: Params, x: jax.Array, **kw: Any) -> jax.Array:
        return self.apply(params, x, **kw)

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.config})"


class CompositeModule(Module):
    """Module with named children (CompositeComponent.ixx:55 parity).

    Children are registered pre-init via :meth:`add` (addComponent parity,
    pre-build only in the reference — here the params dict simply must be
    re-inited after structural changes). Parameters nest by child name.
    """

    def __init__(self, config: Optional[BaseConfig] = None):
        super().__init__(config)
        self._children: dict[str, Module] = {}

    # --- child management (CompositeComponent.ixx:98-259 parity) ---

    def add(self, name: str, module: Module) -> Module:
        if not name or "/" in name:
            raise ValueError(f"invalid child name '{name}'")
        if name in self._children:
            raise KeyError(f"child '{name}' already exists")
        self._children[name] = module
        return module

    def get(self, name: str) -> Module:
        return self._children[name]

    def has(self, name: str) -> bool:
        return name in self._children

    def remove(self, name: str) -> None:
        del self._children[name]

    def replace(self, name: str, module: Module) -> None:
        if name not in self._children:
            raise KeyError(f"no child '{name}'")
        self._children[name] = module

    def children(self) -> Iterator[tuple[str, Module]]:
        return iter(self._children.items())

    def init(self, key: jax.Array, input_shape: Sequence[int]) -> Params:
        """Default: sequential shape propagation through children in order."""
        keys = split_named(key, *self._children.keys())
        params: Params = {}
        shape = tuple(input_shape)
        for name, child in self._children.items():
            params[name] = child.init(keys[name], shape)
            shape = child.output_shape(shape)
        return params

    def output_shape(self, input_shape: Sequence[int]) -> tuple[int, ...]:
        shape = tuple(input_shape)
        for child in self._children.values():
            shape = child.output_shape(shape)
        return shape


class Sequential(CompositeModule):
    """Chain of children applied in registration order (Network.ixx sequential
    container role)."""

    def __init__(self, layers: Optional[Sequence[tuple[str, Module]]] = None, config=None):
        super().__init__(config)
        for name, mod in layers or []:
            self.add(name, mod)

    def apply(self, params, x, *, training=False, rngs=None):
        for name, child in self._children.items():
            # .get: parameter-free children may be absent from restored
            # checkpoints (empty subtrees have no blobs to round-trip).
            x = child.apply(params.get(name, {}), x, training=training, rngs=rngs)
        return x


class Lambda(Module):
    """Parameter-free module wrapping a pure function."""

    def __init__(self, fn: Callable[[jax.Array], jax.Array], name: str = ""):
        super().__init__(BaseConfig(name=name or getattr(fn, "__name__", "lambda")))
        self._fn = fn

    def apply(self, params, x, *, training=False, rngs=None):
        return self._fn(x)
