"""Utils tests: logging, RNG, config, registry (mirrors reference Utils tests)."""

import dataclasses
import io

import jax
import numpy as np
import pytest

from mila_tpu.utils import (
    BaseConfig,
    ConfigError,
    Logger,
    LogLevel,
    Registry,
    RandomGenerator,
    StepLogger,
    split_named,
)


class TestLogger:
    def test_custom_backend_receives_messages(self):
        seen = []
        Logger.set_backend(lambda lvl, msg: seen.append((lvl, msg)))
        try:
            Logger.info("hello {}", 42)
            assert seen == [(LogLevel.INFO, "hello 42")]
        finally:
            Logger.set_backend(None)

    def test_level_filtering(self):
        seen = []
        Logger.set_backend(lambda lvl, msg: seen.append(msg))
        old = Logger.get_level()
        try:
            Logger.set_level(LogLevel.WARNING)
            Logger.info("dropped")
            Logger.error("kept")
            assert seen == ["kept"]
        finally:
            Logger.set_backend(None)
            Logger.set_level(old)


class TestStepLogger:
    def test_csv_output(self):
        buf = io.StringIO()
        sl = StepLogger(["loss", "lr"], stream=buf)
        sl.log_step(1, loss=0.5, lr=1e-3)
        sl.log_step(2, loss=0.25, lr=1e-3)
        lines = buf.getvalue().strip().splitlines()
        assert lines[0] == "time_s,step,loss,lr"
        assert lines[1].split(",")[1] == "1"
        assert lines[2].split(",")[2] == "0.25"


class TestRandomGenerator:
    def test_deterministic_streams(self):
        RandomGenerator.set_seed(123)
        a = RandomGenerator.stream("init")
        RandomGenerator.set_seed(123)
        b = RandomGenerator.stream("init")
        np.testing.assert_array_equal(
            jax.random.key_data(a), jax.random.key_data(b)
        )

    def test_distinct_streams(self):
        RandomGenerator.set_seed(1)
        a = RandomGenerator.stream("a")
        b = RandomGenerator.stream("b")
        assert not np.array_equal(jax.random.key_data(a), jax.random.key_data(b))

    def test_split_named(self):
        ks = split_named(jax.random.key(0), "w", "b")
        assert set(ks) == {"w", "b"}
        assert not np.array_equal(
            jax.random.key_data(ks["w"]), jax.random.key_data(ks["b"])
        )


@dataclasses.dataclass(frozen=True)
class _DemoConfig(BaseConfig):
    width: int = 8
    rate: float = 0.1

    def validate(self):
        if self.width <= 0:
            raise ConfigError("width must be positive")


class TestBaseConfig:
    def test_json_round_trip(self):
        c = _DemoConfig(name="demo", width=32, rate=0.5)
        c2 = _DemoConfig.from_json(c.to_json())
        assert c2 == c

    def test_replace(self):
        c = _DemoConfig(width=8)
        assert c.replace(width=16).width == 16
        assert c.width == 8  # frozen, original untouched

    def test_validate(self):
        with pytest.raises(ConfigError):
            _DemoConfig(width=-1).validate()

    def test_unknown_keys_ignored(self):
        c = _DemoConfig.from_dict({"width": 4, "legacy_field": True})
        assert c.width == 4


class TestRegistry:
    def test_register_get(self):
        r = Registry("thing")
        r.register("a", 1)
        assert r.get("a") == 1
        with pytest.raises(KeyError, match="already registered"):
            r.register("a", 2)
        r.register("a", 2, overwrite=True)
        assert r.get("a") == 2

    def test_variant_fallback(self):
        r = Registry("op")
        r.register("op1", "generic")
        r.register("op1", "bf16-special", variant="bf16")
        assert r.get("op1", variant="bf16") == "bf16-special"
        assert r.get("op1", variant="f32") == "generic"  # fallback

    def test_missing_raises(self):
        r = Registry("x")
        with pytest.raises(KeyError, match="no x named"):
            r.get("nope")


def test_operations_registered():
    import mila_tpu
    from mila_tpu.utils.registry import operations

    mila_tpu.initialize(seed=0)
    for name in [
        "LinearOp",
        "GeluOp",
        "LayerNormOp",
        "AttentionOp",
        "EncoderOp",
        "ResidualOp",
        "SoftmaxOp",
        "SoftmaxCrossEntropyOp",
    ]:
        assert operations.contains(name), name
