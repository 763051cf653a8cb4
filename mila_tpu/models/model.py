"""Model: module + optimizer + jitted training loop with checkpointing.

Parity: reference ``Model`` (Modeling/Model.ixx:71: owns Network+Optimizer;
``train()`` epoch loop w/ val split, early stopping, periodic checkpoints
:123-197; saveCheckpoint/fromCheckpoint :275-533), ``ModelConfig``
(ModelConfig.ixx), ``TrainingHistory`` (TrainingHistory.ixx). The reference's
``trainEpoch``/``validateEpoch`` are stubs returning 0.0 (Model.ixx:541-556);
here they are real and jit-compiled: one fused XLA program per training step
(fwd + loss + backward through manual VJPs + AdamW update), loss computed on
device — fixing the reference's CPU-loss round-trip (Mnist.cpp:437-451).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mila_tpu.data.loader import DatasetReader
from mila_tpu.nn.module import Module
from mila_tpu.optim.adamw import AdamW
from mila_tpu.serialization import (
    CheckpointMetadata,
    SerializationMode,
    find_latest_checkpoint,
    generate_checkpoint_filename,
    load_checkpoint,
    save_checkpoint,
    to_device_tree,
)
from mila_tpu.utils.config import BaseConfig, ConfigError
from mila_tpu.utils.logging import Logger, StepLogger


@dataclasses.dataclass(frozen=True)
class ModelConfig(BaseConfig):
    """Training-loop config (ModelConfig.ixx parity)."""

    epochs: int = 10
    checkpoint_dir: str = ""
    checkpoint_frequency: int = 0  # epochs; 0 = off
    early_stopping_patience: int = 0  # 0 = off
    validation_split: float = 0.0
    verbose: bool = True
    # Microbatch gradient accumulation: batch splits into this many chunks,
    # grads sum before one optimizer step (the reference's beta=1 dW
    # accumulate semantics, CudaLinearOp.ixx:937-962, at training-loop level).
    grad_accum_steps: int = 1
    prefetch_depth: int = 2  # async H2D batch prefetch (0 = synchronous)

    def validate(self):
        if self.epochs <= 0:
            raise ConfigError("epochs must be positive")
        if not 0.0 <= self.validation_split < 1.0:
            raise ConfigError("validation_split must be in [0,1)")
        if self.grad_accum_steps < 1:
            raise ConfigError("grad_accum_steps must be >= 1")


@dataclasses.dataclass
class TrainingHistory:
    """Per-epoch record (TrainingHistory.ixx parity)."""

    train_losses: list = dataclasses.field(default_factory=list)
    val_losses: list = dataclasses.field(default_factory=list)
    best_val_loss: float = float("inf")
    best_epoch: int = -1
    epochs_without_improvement: int = 0
    samples_per_sec: list = dataclasses.field(default_factory=list)

    def record(self, train_loss: float, val_loss: Optional[float], sps: float) -> None:
        self.train_losses.append(float(train_loss))
        if val_loss is not None:
            self.val_losses.append(float(val_loss))
            if val_loss < self.best_val_loss:
                self.best_val_loss = float(val_loss)
                self.best_epoch = len(self.train_losses) - 1
                self.epochs_without_improvement = 0
            else:
                self.epochs_without_improvement += 1
        self.samples_per_sec.append(float(sps))


LossFn = Callable[..., jax.Array]  # (params, *batch) -> scalar loss


class Callback:
    """Training-loop hooks (reference ModelCallback dev prototype,
    Mila/Dev/Misc — completed here). Override any subset."""

    def on_train_begin(self, model: "Model") -> None: ...

    def on_epoch_begin(self, model: "Model", epoch: int) -> None: ...

    def on_epoch_end(
        self, model: "Model", epoch: int, train_loss: float, val_loss: Optional[float]
    ) -> None: ...

    def on_train_end(self, model: "Model") -> None: ...


def split_validation(reader: DatasetReader, fraction: float):
    """Split an in-memory reader into (train, val) readers
    (Model.ixx validation-split behavior). Only ArrayReader-style readers
    (with _inputs/_targets) support automatic splitting."""
    from mila_tpu.data.loader import ArrayReader

    if not isinstance(reader, ArrayReader):
        raise TypeError(
            "validation_split requires an ArrayReader; pass val_reader explicitly"
        )
    n = len(reader)
    n_val = max(int(n * fraction), 1)
    rng = np.random.default_rng(reader.seed)
    perm = rng.permutation(n)
    tr_idx, va_idx = perm[n_val:], perm[:n_val]
    train = ArrayReader(
        reader._inputs[tr_idx], reader._targets[tr_idx], reader.batch_size,
        shuffle=reader.shuffle, seed=reader.seed,
    )
    val = ArrayReader(
        reader._inputs[va_idx], reader._targets[va_idx], reader.batch_size,
        shuffle=False, drop_last=False,
    )
    return train, val


class Model:
    """Owns a module, its params, an optimizer, and the fused train step.

    ``loss_fn(module, params, inputs, targets)`` defaults to softmax-CE over
    the module's logits output.
    """

    def __init__(
        self,
        module: Module,
        optimizer: Optional[AdamW] = None,
        config: Optional[ModelConfig] = None,
        loss_fn: Optional[Callable] = None,
    ):
        self.module = module
        self.optimizer = optimizer or AdamW()
        self.config = config or ModelConfig()
        self.config.validate()
        self._loss_fn = loss_fn or self._default_loss
        self.params: Any = None
        self.opt_state: Any = None
        self.history = TrainingHistory()
        self._train_step = None
        self._eval_step = None

    @staticmethod
    def _default_loss(module: Module, params, inputs, targets) -> jax.Array:
        from mila_tpu.ops import softmax_cross_entropy

        logits = module.apply(params, inputs, training=True)
        return softmax_cross_entropy(logits, targets).mean()

    # --- lifecycle ---

    def build(self, key: jax.Array, input_shape) -> None:
        """Allocate params (Component::build parity) and compile steps."""
        self.params = self.module.init(key, tuple(input_shape))
        self.opt_state = self.optimizer.init(self.params)
        self._compile()

    def _compile(self) -> None:
        opt = self.optimizer
        module = self.module
        loss_fn = self._loss_fn
        accum = self.config.grad_accum_steps

        @jax.jit
        def train_step(params, opt_state, inputs, targets):
            if accum == 1:
                loss, grads = jax.value_and_grad(
                    lambda p: loss_fn(module, p, inputs, targets)
                )(params)
            else:
                B = inputs.shape[0]
                mb = B // accum
                xs = inputs[: mb * accum].reshape(accum, mb, *inputs.shape[1:])
                ys = targets[: mb * accum].reshape(accum, mb, *targets.shape[1:])

                def micro(carry, xy):
                    g_acc, l_acc = carry
                    x, y = xy
                    l, g = jax.value_and_grad(
                        lambda p: loss_fn(module, p, x, y)
                    )(params)
                    g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                    return (g_acc, l_acc + l), None

                zero = jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), params
                )
                (grads, loss_sum), _ = jax.lax.scan(micro, (zero, 0.0), (xs, ys))
                grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
                loss = loss_sum / accum
            params, opt_state = opt.step(opt_state, params, grads)
            return params, opt_state, loss

        @jax.jit
        def eval_step(params, inputs, targets):
            return loss_fn(module, params, inputs, targets)

        self._train_step = train_step
        self._eval_step = eval_step

    def parameter_count(self) -> int:
        return self.module.parameter_count(self.params)

    # --- training (Model.ixx:123-197 parity, actually implemented) ---

    def train(
        self,
        reader: DatasetReader,
        val_reader: Optional[DatasetReader] = None,
        step_logger: Optional[StepLogger] = None,
        callbacks: Optional[list] = None,
    ) -> TrainingHistory:
        if self.params is None:
            raise RuntimeError("call build() before train()")
        cfg = self.config
        callbacks = callbacks or []
        if val_reader is None and cfg.validation_split > 0:
            reader, val_reader = split_validation(reader, cfg.validation_split)
        for cb in callbacks:
            cb.on_train_begin(self)
        for epoch in range(cfg.epochs):
            for cb in callbacks:
                cb.on_epoch_begin(self, epoch)
            t0 = time.monotonic()
            reader.reset(epoch)
            losses = []
            n_seen = 0
            batches = reader
            if cfg.prefetch_depth > 0:
                # Background thread stages the next batches to the device
                # while the current step computes (data/prefetch.py).
                from mila_tpu.data.prefetch import PrefetchLoader

                batches = PrefetchLoader(reader, depth=cfg.prefetch_depth)
            for inputs, targets in batches:
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, jnp.asarray(inputs), jnp.asarray(targets)
                )
                losses.append(loss)
                n_seen += len(inputs)
            train_loss = float(jnp.stack(losses).mean()) if losses else 0.0
            dt = time.monotonic() - t0
            val_loss = self.evaluate(val_reader) if val_reader is not None else None
            self.history.record(train_loss, val_loss, n_seen / max(dt, 1e-9))
            for cb in callbacks:
                cb.on_epoch_end(self, epoch, train_loss, val_loss)
            if step_logger is not None:
                step_logger.log_step(
                    epoch, loss=train_loss, val_loss=val_loss if val_loss is not None else ""
                )
            if cfg.verbose:
                Logger.info(
                    "epoch {}/{}: train_loss={:.4f}{} ({:.0f} samples/s)".format(
                        epoch + 1,
                        cfg.epochs,
                        train_loss,
                        f" val_loss={val_loss:.4f}" if val_loss is not None else "",
                        n_seen / max(dt, 1e-9),
                    )
                )
            if (
                cfg.checkpoint_frequency > 0
                and cfg.checkpoint_dir
                and (epoch + 1) % cfg.checkpoint_frequency == 0
            ):
                self.save_checkpoint(epoch=epoch)
            if (
                cfg.early_stopping_patience > 0
                and self.history.epochs_without_improvement >= cfg.early_stopping_patience
            ):
                Logger.info("early stopping at epoch {}", epoch + 1)
                break
        for cb in callbacks:
            cb.on_train_end(self)
        return self.history

    def evaluate(self, reader: DatasetReader) -> float:
        losses = []
        for inputs, targets in reader:
            losses.append(self._eval_step(self.params, jnp.asarray(inputs), jnp.asarray(targets)))
        return float(jnp.stack(losses).mean()) if losses else 0.0

    def predict(self, inputs) -> jax.Array:
        return self.module.apply(self.params, jnp.asarray(inputs), training=False)

    # --- checkpointing (Model.ixx:275-533 parity) ---

    def save_checkpoint(self, path: Optional[str | Path] = None, epoch: int = 0) -> Path:
        if path is None:
            d = Path(self.config.checkpoint_dir or ".")
            d.mkdir(parents=True, exist_ok=True)
            path = d / generate_checkpoint_filename(self.config.name or "model", epoch)
        meta = CheckpointMetadata(
            epoch=epoch,
            step=int(self.opt_state.step) if hasattr(self.opt_state, "step") else 0,
            train_loss=self.history.train_losses[-1] if self.history.train_losses else 0.0,
            val_loss=self.history.val_losses[-1] if self.history.val_losses else 0.0,
            filepath=str(path),
        )
        save_checkpoint(
            path,
            self.params,
            opt_state=self.opt_state,
            model_config=self.config,
            metadata=meta,
            history=self.history,
        )
        return Path(path)

    def load_checkpoint(self, path: str | Path) -> None:
        data = load_checkpoint(path)
        self.params = to_device_tree(data["params"])
        if data["optimizer"] is not None:
            from mila_tpu.optim.adamw import AdamWState

            od = to_device_tree(data["optimizer"])
            self.opt_state = AdamWState(
                step=jnp.asarray(od["step"], jnp.int32),
                m=od["m"],
                v=od["v"],
                master=od.get("master"),
            )
        else:
            self.opt_state = self.optimizer.init(self.params)
        if data["history"]:
            h = data["history"]
            self.history = TrainingHistory(**h)
        self._compile()

    def resume_training(
        self, reader: DatasetReader, val_reader: Optional[DatasetReader] = None
    ) -> TrainingHistory:
        """Resume from the latest checkpoint in checkpoint_dir
        (Model::resumeTraining parity — a commented draft in the reference,
        Model.ixx:213-247, real here)."""
        latest = find_latest_checkpoint(self.config.checkpoint_dir, self.config.name or "model")
        if latest is not None:
            Logger.info("resuming from {}", latest)
            self.load_checkpoint(latest)
        return self.train(reader, val_reader)

    def export(self, path: str | Path) -> None:
        """Inference-only export (ModelExporter.ixx / InferenceEngine parity)."""
        save_checkpoint(
            path,
            self.params,
            model_config=self.config,
            mode=SerializationMode.EXPORT,
        )
