"""Model partition specs: tensor-parallel sharding rules per model family.

The scaling-book recipe: pick a mesh, annotate param/activation shardings
with PartitionSpecs, let XLA insert the collectives (all-gather for column-
sharded matmul inputs, reduce-scatter/psum after row-sharded matmuls), then
profile. Conventions (weights stored [in, out]):

  * column-parallel Linear (out sharded on 'model'): qkv/wq/wk/wv, mlp fc1,
    gate/up — output activations carry the 'model' shard, no comm needed.
  * row-parallel Linear (in sharded on 'model'): proj/wo, fc2/down — XLA
    inserts a psum over 'model' after the contraction (Megatron pattern).
  * embeddings shard the vocab/feature dim; norms replicate.
  * KV cache shards heads over 'model', batch over 'data'.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mila_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _ns(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def mlp_param_specs(params: Any) -> Any:
    """MLPClassifier: alternate column/row parallel across the stack."""

    def spec_for(path: tuple, leaf) -> P:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        layer = names[0] if names else ""
        kind = names[-1] if names else ""
        col = layer in ("fc1", "fc3", "head") or layer.startswith("fc1")
        if kind == "weight":
            return P(None, MODEL_AXIS) if col else P(MODEL_AXIS, None)
        if kind == "bias":
            return P(MODEL_AXIS) if col else P(None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def gpt2_param_specs(params: Any) -> Any:
    """GPT-2 blocks: qkv+fc1 column-parallel, proj+fc2 row-parallel,
    embeddings sharded on vocab, norms replicated."""

    def spec_for(path: tuple, leaf) -> P:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(names)
        kind = names[-1]
        if "encoder" in joined:
            # wte [Vp, C] shard vocab; wpe [T, C] replicate.
            return P(MODEL_AXIS, None) if kind == "wte" else P()
        if kind in ("gamma", "beta"):
            return P()
        column = any(k in joined for k in ("qkv", "fc1", "lm_head"))
        row = any(k in joined for k in ("proj", "fc2"))
        if kind == "weight":
            if column:
                return P(None, MODEL_AXIS)
            if row:
                return P(MODEL_AXIS, None)
            return P()
        if kind == "bias":
            return P(MODEL_AXIS) if column else P()
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def llama_param_specs(params: Any) -> Any:
    """Llama blocks: wq/wk/wv/gate/up column-parallel, wo/down row-parallel,
    embed sharded on vocab, RMSNorm gammas replicated."""

    def spec_for(path: tuple, leaf) -> P:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(names)
        kind = names[-1]
        if "embed" in joined:
            return P(MODEL_AXIS, None) if kind == "wte" else P()
        if kind == "gamma":
            return P()
        column = any(f"/{k}/" in f"/{joined}/" for k in ("wq", "wk", "wv", "gate", "up", "lm_head"))
        row = any(f"/{k}/" in f"/{joined}/" for k in ("wo", "down"))
        if kind == "weight":
            if column:
                return P(None, MODEL_AXIS)
            if row:
                return P(MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def kv_cache_specs(cache: Any) -> Any:
    """Token-major KV cache: batch on 'data', heads on 'model'. Handles both
    the per-layer [B, T, NKV, HD] layout (GPT-2) and Llama's stacked
    [L, B, T, NKV, HD] pools (init_kv_cache layouts)."""

    def spec(leaf):
        if getattr(leaf, "ndim", 4) == 5:
            return P(None, DATA_AXIS, None, MODEL_AXIS, None)
        return P(DATA_AXIS, None, MODEL_AXIS, None)

    return jax.tree_util.tree_map(spec, cache)


def batch_specs(batch: Any) -> Any:
    """Input batches shard the leading dim over 'data'."""
    return jax.tree_util.tree_map(lambda _: P(DATA_AXIS), batch)


def to_shardings(mesh: Mesh, specs: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda s: isinstance(s, P),
    )


def shard_tree(mesh: Mesh, tree: Any, specs: Any) -> Any:
    """device_put a pytree with per-leaf PartitionSpecs."""
    shardings = to_shardings(mesh, specs)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


PARAM_SPEC_FNS: dict[str, Callable[[Any], Any]] = {
    "mlp": mlp_param_specs,
    "gpt2": gpt2_param_specs,
    "llama": llama_param_specs,
}
