"""Visualization sample: train a small MLP and render weight heatmaps +
training curves (reference Samples/Viz + MilaStudio parity, terminal/PPM
instead of Win32)."""

from __future__ import annotations

import argparse

import jax

import mila_tpu
from mila_tpu.data import MnistReader
from mila_tpu.models import MLPClassifier, MLPClassifierConfig, Model, ModelConfig
from mila_tpu.viz import (
    FrameBuffer,
    HeatMapRenderer,
    render_training_curve,
    visualize_params,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--ppm-out", default="", help="write weight heatmap PPM here")
    args = ap.parse_args()

    mila_tpu.initialize(0)
    train = MnistReader(batch_size=128, synthetic_n=2048)
    model = Model(
        MLPClassifier(MLPClassifierConfig(hidden_dims=(64, 32))),
        config=ModelConfig(epochs=args.epochs, verbose=False),
    )
    model.build(jax.random.key(0), (128, 784))
    model.train(train)

    print(render_training_curve(model.history.train_losses, label="train loss"))
    print()
    print(visualize_params({"fc1": model.params["fc1"]}))

    if args.ppm_out:
        fb = FrameBuffer(512, 256)
        HeatMapRenderer(max_size=256).render_to(fb, model.params["fc1"]["weight"])
        fb.to_ppm(args.ppm_out)
        print(f"wrote {args.ppm_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
