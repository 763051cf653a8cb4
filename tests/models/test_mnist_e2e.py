"""End-to-end MNIST-MLP training (the reference's validated workload,
BASELINE config 1). Mirrors trainMnist (Mnist.cpp:315-530) + checkpoint
resume. Uses the synthetic surrogate when real IDX files are absent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.data import MnistReader
from mila_tpu.models import (
    MLPClassifier,
    MLPClassifierConfig,
    Model,
    ModelConfig,
    accuracy,
)
from mila_tpu.optim import AdamW, AdamWConfig


@pytest.fixture(scope="module")
def trained_model():
    jax.config.update("jax_default_matmul_precision", "highest")
    train = MnistReader(batch_size=128, split="train", synthetic_n=4096, seed=0)
    test = MnistReader(
        batch_size=128, split="test", synthetic_n=1024, shuffle=False, drop_last=False
    )
    model = Model(
        MLPClassifier(MLPClassifierConfig(name="mnist")),
        AdamW(AdamWConfig(learning_rate=1e-3)),
        ModelConfig(name="mnist", epochs=4, verbose=False),
    )
    model.build(jax.random.key(0), (128, 784))
    model.train(train)
    return model, test


class TestMnistEndToEnd:
    def test_parameter_count(self, trained_model):
        model, _ = trained_model
        # 784*128+128 + 128*64+64 + 64*10+10 (MnistClassifier.ixx parity).
        assert model.parameter_count() == 784 * 128 + 128 + 128 * 64 + 64 + 64 * 10 + 10

    def test_loss_decreases(self, trained_model):
        model, _ = trained_model
        h = model.history
        assert len(h.train_losses) == 4
        assert h.train_losses[-1] < h.train_losses[0] * 0.5

    def test_accuracy_target(self, trained_model):
        """≥97.5% on the surrogate task (reference README.md:63 parity gate)."""
        model, test = trained_model
        xs, ys = [], []
        for xb, yb in test:
            xs.append(model.predict(xb))
            ys.append(yb)
        acc = accuracy(jnp.concatenate(xs), np.concatenate(ys))
        assert acc >= 0.975, f"accuracy {acc:.4f} below 97.5% parity target"

    def test_checkpoint_resume_preserves_behavior(self, trained_model, tmp_path):
        model, test = trained_model
        path = tmp_path / "mnist.mila"
        model.save_checkpoint(path, epoch=3)

        model2 = Model(
            MLPClassifier(MLPClassifierConfig(name="mnist")),
            AdamW(AdamWConfig(learning_rate=1e-3)),
            ModelConfig(name="mnist", epochs=1, verbose=False),
        )
        model2.load_checkpoint(path)
        xb, yb = test.next_batch(0)
        np.testing.assert_allclose(
            model2.predict(xb), model.predict(xb), rtol=1e-5, atol=1e-6
        )
        assert int(model2.opt_state.step) == int(model.opt_state.step)

    def test_evaluate_returns_finite(self, trained_model):
        model, test = trained_model
        loss = model.evaluate(test)
        assert np.isfinite(loss) and loss < 1.0


class TestModelConfigValidation:
    def test_bad_config(self):
        from mila_tpu.utils.config import ConfigError

        with pytest.raises(ConfigError):
            ModelConfig(epochs=0).validate()
        with pytest.raises(ConfigError):
            ModelConfig(validation_split=1.5).validate()

    def test_train_before_build_raises(self):
        model = Model(MLPClassifier())
        with pytest.raises(RuntimeError, match="build"):
            model.train(MnistReader(batch_size=8, synthetic_n=64))


class TestEarlyStopping:
    def test_early_stop_triggers(self):
        train = MnistReader(batch_size=64, synthetic_n=256, seed=0)
        val = MnistReader(batch_size=64, split="test", synthetic_n=128, shuffle=False)
        model = Model(
            MLPClassifier(MLPClassifierConfig()),
            AdamW(AdamWConfig(learning_rate=1e-3)),
            ModelConfig(epochs=50, early_stopping_patience=2, verbose=False),
        )
        model.build(jax.random.key(1), (64, 784))
        h = model.train(train, val)
        assert len(h.train_losses) < 50  # stopped early
