"""Parallelism: mesh construction, partition specs, distributed init.

Parity: reference §2.10 (all absent there — built TPU-native here).
"""

from mila_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    local_batch_size,
    make_mesh,
    replicated,
    sharding,
    single_device_mesh,
)
from mila_tpu.parallel.sharding import (
    PARAM_SPEC_FNS,
    batch_specs,
    gpt2_param_specs,
    kv_cache_specs,
    llama_param_specs,
    mlp_param_specs,
    shard_tree,
    to_shardings,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "local_batch_size",
    "make_mesh",
    "replicated",
    "sharding",
    "single_device_mesh",
    "PARAM_SPEC_FNS",
    "batch_specs",
    "gpt2_param_specs",
    "kv_cache_specs",
    "llama_param_specs",
    "mlp_param_specs",
    "shard_tree",
    "to_shardings",
]
