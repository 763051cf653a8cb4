"""Training callbacks + tensor describe tests."""

import jax
import jax.numpy as jnp

from mila_tpu.data import MnistReader
from mila_tpu.models import MLPClassifier, MLPClassifierConfig, Model, ModelConfig
from mila_tpu.models.model import Callback
from mila_tpu.tensor.tensor_ops import describe


class _Recorder(Callback):
    def __init__(self):
        self.events = []

    def on_train_begin(self, model):
        self.events.append("begin")

    def on_epoch_begin(self, model, epoch):
        self.events.append(f"eb{epoch}")

    def on_epoch_end(self, model, epoch, train_loss, val_loss):
        self.events.append(f"ee{epoch}:{train_loss > 0}")

    def on_train_end(self, model):
        self.events.append("end")


def test_callbacks_fire_in_order():
    train = MnistReader(batch_size=64, synthetic_n=128)
    model = Model(
        MLPClassifier(MLPClassifierConfig(hidden_dims=(16,))),
        config=ModelConfig(epochs=2, verbose=False),
    )
    model.build(jax.random.key(0), (64, 784))
    rec = _Recorder()
    model.train(train, callbacks=[rec])
    assert rec.events == ["begin", "eb0", "ee0:True", "eb1", "ee1:True", "end"]


def test_validation_split_auto():
    train = MnistReader(batch_size=32, synthetic_n=256)
    model = Model(
        MLPClassifier(MLPClassifierConfig(hidden_dims=(16,))),
        config=ModelConfig(epochs=1, verbose=False, validation_split=0.25),
    )
    model.build(jax.random.key(0), (32, 784))
    h = model.train(train)
    assert len(h.val_losses) == 1 and h.val_losses[0] > 0


def test_describe():
    s = describe(jnp.arange(100.0).reshape(10, 10), name="w")
    assert "w[10, 10]" in s and "mean=" in s and "float32" in s
    tiny = describe(jnp.array([1.0, 2.0]))
    assert "1, 2" in tiny
