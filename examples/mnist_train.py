"""MNIST MLP training sample — the reference's validated workload.

Parity: reference ``Samples/MNIST/Src/Mnist.cpp`` (arg parsing :60-135,
trainMnist :315-530), re-built on the TPU-native stack: device-fused loss,
one XLA program per step.

Usage: python examples/mnist_train.py [--epochs N] [--batch-size B]
       [--device auto|tpu|cpu] [--precision auto|performance|accuracy]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import mila_tpu
from mila_tpu.data import MnistReader
from mila_tpu.models import (
    MLPClassifier,
    MLPClassifierConfig,
    Model,
    ModelConfig,
    accuracy,
)
from mila_tpu.optim import AdamW, AdamWConfig
from mila_tpu.runtime import get_device
from mila_tpu.utils.logging import Logger


def main() -> int:
    ap = argparse.ArgumentParser(description="MNIST MLP (784-128-64-10) training")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--device", default="auto")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--synthetic-n", type=int, default=12000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--checkpoint", default="")
    args = ap.parse_args()

    mila_tpu.initialize(seed=args.seed)
    dev = get_device(args.device)
    Logger.info("training on {} ({})", dev, dev.platform)

    train = MnistReader(
        batch_size=args.batch_size, split="train",
        data_dir=args.data_dir, synthetic_n=args.synthetic_n, seed=args.seed,
    )
    test = MnistReader(
        batch_size=512, split="test", data_dir=args.data_dir,
        synthetic_n=args.synthetic_n // 5, shuffle=False, drop_last=False,
    )
    Logger.info(
        "dataset: {} train / {} test examples{}",
        len(train), len(test), " (synthetic surrogate)" if train.is_synthetic else "",
    )

    model = Model(
        MLPClassifier(MLPClassifierConfig(name="mnist")),
        AdamW(AdamWConfig(learning_rate=args.lr)),
        ModelConfig(name="mnist", epochs=args.epochs),
    )
    model.build(jax.random.key(args.seed), (args.batch_size, 784))
    Logger.info("model parameters: {}", model.parameter_count())

    t0 = time.monotonic()
    model.train(train)
    Logger.info("training wall time: {:.1f}s", time.monotonic() - t0)

    logits, targets = [], []
    for xb, yb in test:
        logits.append(model.predict(xb))
        targets.append(yb)
    acc = accuracy(jnp.concatenate(logits), np.concatenate(targets))
    thr = np.mean(model.history.samples_per_sec[1:]) if args.epochs > 1 else (
        model.history.samples_per_sec[0]
    )
    print(f"final test accuracy: {acc * 100:.2f}%")
    print(f"training throughput: {thr:,.0f} samples/sec (reference: ~136,000 on CUDA)")

    if args.checkpoint:
        path = model.save_checkpoint(args.checkpoint, epoch=args.epochs - 1)
        Logger.info("checkpoint saved: {}", path)
    return 0 if acc >= 0.975 else 1


if __name__ == "__main__":
    raise SystemExit(main())
