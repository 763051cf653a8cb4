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

    # --- TP collectives ACROSS the process boundary (BASELINE config 5) ---
    # Mesh axes ("model", "data") over the same device array: the model (TP)
    # axis now pairs device 0 (host 0) with device 2 (host 1), so every
    # row-parallel matmul's psum rides the gloo DCN link.
    from mila_tpu.models.llama import Llama, LlamaConfig
    from mila_tpu.parallel import (
        kv_cache_specs, llama_param_specs, shard_tree,
    )
    from mila_tpu.parallel.ring_attention import ring_attention

    tp_mesh = Mesh(np.array(jax.devices()).reshape(2, 2), ("model", "data"))
    model = Llama(LlamaConfig.tiny(vocab_size=64))
    params = model.init(jax.random.key(0), (2, 8))
    sparams = shard_tree(tp_mesh, params, llama_param_specs(params))
    cache = model.init_kv_cache(2, 16, jnp.float32)
    scache = shard_tree(tp_mesh, cache, kv_cache_specs(cache))
    toks = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % 64

    with tp_mesh:
        logits, scache = jax.jit(
            lambda p, t, c: model.forward_with_cache(p, t, c, 0)
        )(sparams, toks, scache)
        nxt = jnp.argmax(logits[:, -1:, :], -1).astype(jnp.int32)
        # One decode step over the sharded cache: wq/wk/wv column-sharded on
        # tp, wo/down row-sharded -> psum over tp crosses the two processes.
        logits2, _ = jax.jit(
            lambda p, t, c: model.forward_with_cache(p, t, c, 8)
        )(sparams, nxt, scache)
        val = float(jnp.sum(jnp.abs(logits2)))
    assert np.isfinite(val)
    print(f"TPOK {pid} {val:.6f}", flush=True)

    # Ring-attention prefill over the cross-host mesh (sequence sharded on
    # the cross-host axis): ppermute hops cross the process boundary each
    # ring step.
    B, T, NH, D = 2, 8, 2, 4
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(k1, (B, T, NH, D), jnp.float32)
    k = jax.random.normal(k2, (B, T, NH, D), jnp.float32)
    v = jax.random.normal(k3, (B, T, NH, D), jnp.float32)
    ring = ring_attention(q, k, v, tp_mesh, seq_axis="model", causal=True)
    from mila_tpu.ops.attention import dot_product_attention
    ref = dot_product_attention(q, k, v, causal=True)
    err = float(jnp.max(jnp.abs(ring - ref)))
    assert err < 1e-4, err
    print(f"RINGOK {pid} {err:.2e}", flush=True)
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
    vals, tp_vals, ring_ranks = {}, {}, set()
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MHOK"):
                _, pid, total = line.split()
                vals[int(pid)] = float(total)
            elif line.startswith("TPOK"):
                _, pid, v = line.split()
                tp_vals[int(pid)] = float(v)
            elif line.startswith("RINGOK"):
                ring_ranks.add(int(line.split()[1]))
    assert set(vals) == {0, 1}, f"missing rank output: {outs}"
    # Both hosts agree on the cross-host reduction.
    assert vals[0] == vals[1]
    # TP decode crossed the process boundary and both ranks agree.
    assert set(tp_vals) == {0, 1}, f"missing TP output: {outs}"
    assert tp_vals[0] == tp_vals[1]
    # Ring attention matched the dense oracle on both ranks.
    assert ring_ranks == {0, 1}, f"missing ring output: {outs}"
    # Value check: ArrayReader strides rank 0 -> rows 0..3? rank 1 -> next 4.
    # Whatever the striding order, the 8 selected rows are disjoint, so the
    # sum differs from double-counting one rank's rows.
    assert vals[0] > 0.0
