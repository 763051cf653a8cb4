"""Two-process CPU DCN simulation: CI-lock for the multi-host path.

BASELINE config 5 needs >= 2-host scaling; real multi-chip hardware is not
available in CI, so this spawns two OS processes that form a jax.distributed
cluster over loopback (gloo CPU collectives = simulated DCN), then runs
`initialize_distributed` + global-array construction + a cross-host
reduction + per-rank DatasetReader striding. Locks the code path in
mila_tpu/parallel/distributed.py against rot.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent.parent

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mila_tpu.parallel.distributed import (
        initialize_distributed, is_primary, topology,
    )
    from mila_tpu.data import ArrayReader

    port, pid = sys.argv[1], int(sys.argv[2])
    info = initialize_distributed(f"127.0.0.1:{port}", 2, pid)
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 4, info
    assert is_primary() == (pid == 0)

    # Host x chip mesh: dp across hosts, tp within host.
    mesh = Mesh(np.array(jax.devices()).reshape(2, 2), ("dp", "tp"))

    # Per-rank data striding: each host reads its own disjoint batch rows.
    data = np.arange(32, dtype=np.float32).reshape(16, 2)
    labels = np.zeros(16, dtype=np.int32)
    reader = ArrayReader(data, labels, batch_size=4, shuffle=False,
                         process_rank=pid, num_processes=2)
    xb, _ = next(iter(reader))
    local_rows = np.asarray(xb)

    # Assemble the global batch from per-process shards; reduce across hosts.
    g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp", None)), local_rows
    )
    assert g.shape[0] == 2 * local_rows.shape[0]
    total = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(g)
    total = float(total)

    # Ranks stride disjoint rows -> the global sum covers 8 distinct rows of
    # the 16-row dataset; both processes must agree on the reduced value.
    print(f"MHOK {pid} {total}", flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_cluster(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
    vals = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MHOK"):
                _, pid, total = line.split()
                vals[int(pid)] = float(total)
    assert set(vals) == {0, 1}, f"missing rank output: {outs}"
    # Both hosts agree on the cross-host reduction.
    assert vals[0] == vals[1]
    # Value check: ArrayReader strides rank 0 -> rows 0..3? rank 1 -> next 4.
    # Whatever the striding order, the 8 selected rows are disjoint, so the
    # sum differs from double-counting one rank's rows.
    assert vals[0] > 0.0
