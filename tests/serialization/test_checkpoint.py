"""Serialization tests (mirrors Tests/Dnn/Serialization/* and Modeling/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.serialization import (
    CheckpointMetadata,
    ModelArchive,
    OpenMode,
    find_latest_checkpoint,
    generate_checkpoint_filename,
    load_checkpoint,
    save_checkpoint,
    to_device_tree,
)


class TestModelArchive:
    def test_json_round_trip(self, tmp_path):
        p = tmp_path / "a.mila"
        with ModelArchive(p, OpenMode.WRITE) as ar:
            ar.write_json("model/meta.json", {"epoch": 3, "name": "x"})
        with ModelArchive(p) as ar:
            assert ar.read_json("model/meta.json") == {"epoch": 3, "name": "x"}

    def test_tensor_round_trip_dtypes(self, tmp_path, rng_key):
        p = tmp_path / "t.mila"
        arrays = {
            "f32": jax.random.normal(rng_key, (3, 4)),
            "bf16": jax.random.normal(rng_key, (8,)).astype(jnp.bfloat16),
            "i32": jnp.arange(6, dtype=jnp.int32).reshape(2, 3),
            "i8": jnp.array([[1, -2], [3, -4]], jnp.int8),
            "scalar": jnp.float32(2.5),
        }
        with ModelArchive(p, OpenMode.WRITE) as ar:
            for k, v in arrays.items():
                ar.write_tensor(f"tensors/{k}", v)
        with ModelArchive(p) as ar:
            for k, v in arrays.items():
                back = ar.read_tensor(f"tensors/{k}")
                np.testing.assert_array_equal(back, np.asarray(v))
                assert back.dtype == np.asarray(v).dtype

    def test_tree_round_trip(self, tmp_path, rng_key):
        p = tmp_path / "tree.mila"
        tree = {
            "fc1": {"weight": jax.random.normal(rng_key, (4, 8)), "bias": jnp.zeros(8)},
            "ln": {"gamma": jnp.ones(8)},
        }
        with ModelArchive(p, OpenMode.WRITE) as ar:
            ar.write_tree("params", tree)
        with ModelArchive(p) as ar:
            back = ar.read_tree("params")
        assert set(back) == {"fc1", "ln"}
        np.testing.assert_array_equal(back["fc1"]["weight"], tree["fc1"]["weight"])

    def test_path_normalization_and_escape(self, tmp_path):
        p = tmp_path / "n.mila"
        with ModelArchive(p, OpenMode.WRITE) as ar:
            ar.write_json("a//b/./c.json", 1)
            with pytest.raises(ValueError, match="escapes"):
                ar.write_json("../evil.json", 2)
        with ModelArchive(p) as ar:
            assert ar.read_json("a/b/c.json") == 1
            assert ar.exists("a/b/c.json")
            assert not ar.exists("nope.json")
            assert ar.list("a") == ["a/b/c.json"]


class TestCheckpoint:
    def _params(self, key):
        return {
            "fc": {"weight": jax.random.normal(key, (4, 3)), "bias": jnp.zeros(3)},
        }

    def test_save_load_params_only(self, tmp_path, rng_key):
        p = tmp_path / "ck.mila"
        params = self._params(rng_key)
        save_checkpoint(p, params, metadata=CheckpointMetadata(epoch=2, train_loss=0.5))
        data = load_checkpoint(p)
        assert data["meta"]["epoch"] == 2
        assert data["meta"]["framework_version"]
        np.testing.assert_array_equal(data["params"]["fc"]["weight"], params["fc"]["weight"])
        assert data["optimizer"] is None

    def test_save_load_with_optimizer(self, tmp_path, rng_key):
        from mila_tpu.optim import AdamW, AdamWConfig

        params = self._params(rng_key)
        opt = AdamW(AdamWConfig(learning_rate=0.01))
        state = opt.init(params)
        params2, state2 = opt.step(state, params, jax.tree_util.tree_map(jnp.ones_like, params))
        p = tmp_path / "ck2.mila"
        save_checkpoint(p, params2, opt_state=state2)
        data = load_checkpoint(p)
        od = to_device_tree(data["optimizer"])
        assert int(od["step"]) == 1
        np.testing.assert_allclose(od["m"]["fc"]["weight"], state2.m["fc"]["weight"], rtol=1e-6)

    def test_filename_and_latest_discovery(self, tmp_path, rng_key):
        params = self._params(rng_key)
        for e in (1, 3, 2):
            name = generate_checkpoint_filename("model", e)
            save_checkpoint(tmp_path / name, params, metadata=CheckpointMetadata(epoch=e))
        latest = find_latest_checkpoint(tmp_path, "model")
        assert latest is not None and "epoch0003" in latest.name
        assert find_latest_checkpoint(tmp_path / "missing") is None
