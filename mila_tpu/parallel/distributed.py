"""Multi-host runtime initialization.

Parity: reference §2.10 — nothing distributed exists there; this is the
TPU-native path: ``jax.distributed.initialize`` + SPMD over a host×chip
mesh. Each host runs the same program; global arrays are sharded via
NamedSharding and per-host data loading uses DatasetReader's
``process_rank``/``num_processes`` (the llm.c-style params the reference
threads through its GPT-2 loader but never uses, Gpt2DataLoader.ixx:72-79).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from mila_tpu.utils.logging import Logger

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX if env/args say so; no-op on single host.

    Honors standard env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID) and TPU pod metadata (auto-detected by jax on real pods).
    Returns topology info.
    """
    global _initialized
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if not _initialized and (coordinator_address or num_processes):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
        Logger.info(
            "distributed: process {}/{} with {} local / {} global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    return topology()


def topology() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_primary() -> bool:
    """True on the host that should write checkpoints/logs."""
    return jax.process_index() == 0
