"""Visualization, plugin manager, component factory, evaluation tests
(reference layers 9 + Core/ComponentFactory + Engine metrics)."""

import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.extensibility import PluginManager
from mila_tpu.nn.factory import create_component, create_network, network_to_spec
from mila_tpu.viz import (
    FrameBuffer,
    HeatMapRenderer,
    colormap,
    render_training_curve,
    visualize_params,
)


class TestFrameBuffer:
    def test_basic_ops(self):
        fb = FrameBuffer(16, 8)
        fb.clear((10, 20, 30))
        assert tuple(fb.pixels[0, 0]) == (10, 20, 30)
        fb.set_pixel(3, 2, (255, 0, 0))
        assert tuple(fb.pixels[2, 3]) == (255, 0, 0)
        fb.set_pixel(100, 100, (1, 1, 1))  # out of bounds: no crash

    def test_blit_clipping(self):
        fb = FrameBuffer(8, 8)
        img = np.full((6, 6, 3), 9, np.uint8)
        fb.blit(5, 5, img)
        assert tuple(fb.pixels[7, 7]) == (9, 9, 9)
        assert tuple(fb.pixels[4, 4]) == (0, 0, 0)

    def test_ppm_export(self, tmp_path):
        fb = FrameBuffer(4, 2)
        fb.clear((1, 2, 3))
        p = tmp_path / "x.ppm"
        fb.to_ppm(p)
        data = p.read_bytes()
        assert data.startswith(b"P6 4 2 255\n")
        assert len(data) == len(b"P6 4 2 255\n") + 4 * 2 * 3

    def test_invalid_dims(self):
        with pytest.raises(ValueError):
            FrameBuffer(0, 5)


class TestHeatmap:
    def test_colormap_range(self):
        rgb = colormap(np.linspace(0, 1, 10).reshape(2, 5))
        assert rgb.shape == (2, 5, 3) and rgb.dtype == np.uint8

    def test_render_ascii(self, rng_key):
        w = jax.random.normal(rng_key, (32, 64))
        art = HeatMapRenderer().render_ascii(w, width=32)
        lines = art.splitlines()
        assert len(lines) >= 2 and all(len(l) <= 64 for l in lines)

    def test_render_rgb_shapes(self, rng_key):
        r = HeatMapRenderer(max_size=16)
        rgb = r.render_rgb(jax.random.normal(rng_key, (100, 100)))
        assert rgb.shape[0] <= 17 and rgb.shape[2] == 3

    def test_training_curve(self):
        art = render_training_curve([3.0, 2.0, 1.0, 0.5], width=20, height=5)
        assert "*" in art and "max" in art

    def test_visualize_params(self, rng_key):
        params = {"fc": {"weight": jax.random.normal(rng_key, (16, 16))}}
        out = visualize_params(params)
        assert "fc/weight" in out


class TestComponentFactory:
    def test_create_component(self):
        layer = create_component("Linear", {"in_features": 4, "out_features": 2})
        assert layer.config.out_features == 2

    def test_create_network_round_trip(self, rng_key):
        spec = [
            {"type": "Linear", "name": "fc1", "config": {"in_features": 8, "out_features": 16}},
            {"type": "Gelu", "name": "act"},
            {"type": "Linear", "name": "fc2", "config": {"in_features": 16, "out_features": 4}},
        ]
        net = create_network(spec)
        p = net.init(rng_key, (2, 8))
        y = net.apply(p, jax.random.normal(rng_key, (2, 8)))
        assert y.shape == (2, 4)
        spec2 = network_to_spec(net)
        assert [s["type"] for s in spec2] == ["Linear", "Gelu", "Linear"]
        net2 = create_network(spec2)
        y2 = net2.apply(net2.init(rng_key, (2, 8)), jax.random.normal(rng_key, (2, 8)))
        assert y2.shape == (2, 4)

    def test_unknown_component(self):
        with pytest.raises(KeyError):
            create_component("Conv99", {})


class TestPluginManager:
    def _write_plugin(self, tmp_path, name="demo", bad=False):
        body = textwrap.dedent(
            f"""
            class _P:
                name = "{name}"
                version = "1.0"
                initialized = False
                def initialize(self): self.initialized = True
                def shutdown(self): self.initialized = False
            {"MILA_TPU_PLUGIN = _P()" if not bad else "# no export"}
            """
        )
        p = tmp_path / f"{name}_plugin.py"
        p.write_text(body)
        return p

    def test_load_initialize_unload(self, tmp_path):
        pm = PluginManager()
        path = self._write_plugin(tmp_path)
        plugin = pm.load_from_path(path)
        assert plugin.initialized and pm.get("demo") is plugin
        assert pm.list_plugins() == ["demo"]
        pm.unload("demo")
        assert not plugin.initialized and pm.get("demo") is None

    def test_missing_export_raises(self, tmp_path):
        pm = PluginManager()
        path = self._write_plugin(tmp_path, name="bad", bad=True)
        with pytest.raises(ImportError, match="MILA_TPU_PLUGIN"):
            pm.load_from_path(path)

    def test_scan_directory_skips_bad(self, tmp_path):
        pm = PluginManager()
        self._write_plugin(tmp_path, name="good")
        self._write_plugin(tmp_path, name="ugly", bad=True)
        loaded = pm.scan_directory(tmp_path)
        assert [p.name for p in loaded] == ["good"]

    def test_duplicate_rejected(self, tmp_path):
        pm = PluginManager()
        pm.load_from_path(self._write_plugin(tmp_path))
        with pytest.raises(KeyError, match="already loaded"):
            pm.load_from_path(self._write_plugin(tmp_path / "sub" if (tmp_path / "sub").mkdir() or True else tmp_path))


class TestEvaluation:
    def test_perplexity_and_delta(self, rng_key):
        from mila_tpu.inference.quantize import dequantize, QTensor, quantize_model_params
        from mila_tpu.models.evaluation import perplexity, perplexity_delta
        from mila_tpu.models.gpt2 import GPT2, GPT2Config

        cfg = GPT2Config(vocab_size=64, max_seq_len=16, num_layers=1, num_heads=2,
                         embedding_dim=32)
        model = GPT2(cfg)
        params = model.init(rng_key, (2, 8))

        def batches():
            rng = np.random.default_rng(0)
            for _ in range(3):
                x = rng.integers(0, 64, (2, 8)).astype(np.int32)
                yield x, np.roll(x, -1, 1)

        ppl = perplexity(model, params, batches())
        assert 1.0 < ppl < 200.0  # random model ≈ vocab-size perplexity

        qparams = quantize_model_params(params, "int8", min_size=512)
        deq = jax.tree_util.tree_map(
            lambda l: dequantize(l) if isinstance(l, QTensor) else l,
            qparams, is_leaf=lambda l: isinstance(l, QTensor),
        )
        report = perplexity_delta(model, params, deq, batches)
        assert abs(report["rel_delta"]) < 0.1
