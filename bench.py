"""Benchmark harness — prints ONE JSON line for the driver.

Round-1 headline: MNIST MLP training throughput (samples/sec) vs the
reference's published ~136,000 samples/sec on CUDA (README.md:66,
BASELINE.md). Later rounds add GPT-2/Llama decode tokens/sec once the
quantized inference engine lands.

Usage: python bench.py [--what mnist]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

MNIST_REF_SAMPLES_PER_SEC = 136_000.0  # reference README.md:66


def bench_mnist_training() -> dict:
    import jax
    import jax.numpy as jnp

    import mila_tpu
    from mila_tpu.data import synthetic_mnist
    from mila_tpu.models import MLPClassifier, MLPClassifierConfig
    from mila_tpu.optim import AdamW, AdamWConfig
    from mila_tpu.ops import softmax_cross_entropy

    mila_tpu.initialize(seed=0)
    batch = 2048
    n = 65536
    x_np, y_np = synthetic_mnist(n=n, seed=0)
    x = jnp.asarray(x_np)
    y = jnp.asarray(y_np)

    module = MLPClassifier(MLPClassifierConfig(name="bench-mnist"))
    params = module.init(jax.random.key(0), (batch, 784))
    opt = AdamW(AdamWConfig(learning_rate=1e-3))
    opt_state = opt.init(params)

    steps_per_epoch = n // batch

    def loss_fn(p, xb, yb):
        return softmax_cross_entropy(module.apply(p, xb), yb).mean()

    @jax.jit
    def epoch(params, opt_state, x, y):
        def body(carry, i):
            params, opt_state = carry
            xb = jax.lax.dynamic_slice_in_dim(x, i * batch, batch)
            yb = jax.lax.dynamic_slice_in_dim(y, i * batch, batch)
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
            params, opt_state = opt.step(opt_state, params, grads)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps_per_epoch)
        )
        return params, opt_state, losses.mean()

    # Warmup (compile) + one timed check that loss decreases.
    params, opt_state, l0 = epoch(params, opt_state, x, y)
    jax.block_until_ready(l0)
    # Time enough epochs for a >2s window; block on params (the full chain).
    n_epochs = 5
    dt = 0.0
    while True:
        t0 = time.perf_counter()
        for _ in range(n_epochs):
            params, opt_state, loss = epoch(params, opt_state, x, y)
        jax.block_until_ready((params, loss))
        dt = time.perf_counter() - t0
        if dt > 2.0 or n_epochs >= 640:
            break
        n_epochs *= 4
    sps = n_epochs * steps_per_epoch * batch / dt
    assert float(loss) < float(l0), "training must make progress during bench"
    return {
        "metric": "mnist_mlp_train_throughput",
        "value": round(sps, 1),
        "unit": "samples/sec",
        "vs_baseline": round(sps / MNIST_REF_SAMPLES_PER_SEC, 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="mnist", choices=["mnist"])
    args = ap.parse_args()
    result = bench_mnist_training()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
