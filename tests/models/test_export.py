"""Inference export/load tests (InferenceEngine/ModelExporter parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.models.export import Predictor, export_model, load_exported
from mila_tpu.models.gpt2 import GPT2, GPT2Config
from mila_tpu.models.mlp_classifier import MLPClassifier, MLPClassifierConfig
from mila_tpu.nn import Gelu, Linear, LinearConfig, Sequential


class TestExportLoad:
    def test_gpt2_round_trip(self, tmp_path, rng_key):
        cfg = GPT2Config(vocab_size=64, max_seq_len=16, num_layers=1,
                         num_heads=2, embedding_dim=32)
        model = GPT2(cfg)
        params = model.init(rng_key, (1, 8))
        p = tmp_path / "gpt2.mila"
        export_model(p, model, params)
        model2, params2 = load_exported(p)
        toks = jnp.array([[1, 2, 3]], jnp.int32)
        np.testing.assert_allclose(
            model.apply(params, toks), model2.apply(params2, toks), rtol=1e-5, atol=1e-6
        )
        assert model2.config.num_heads == 2

    def test_mlp_classifier_round_trip(self, tmp_path, rng_key):
        model = MLPClassifier(MLPClassifierConfig(hidden_dims=(32, 16)))
        params = model.init(rng_key, (1, 784))
        p = tmp_path / "mlp.mila"
        export_model(p, model, params)
        x = jax.random.normal(rng_key, (3, 784))
        pred = Predictor.from_archive(p)
        np.testing.assert_allclose(
            pred.predict_batch(x), model.apply(params, x), rtol=1e-5, atol=1e-6
        )
        single = pred.predict(x[0])
        assert single.shape == (10,)

    def test_sequential_via_factory_spec(self, tmp_path, rng_key):
        net = Sequential([
            ("fc1", Linear(LinearConfig(in_features=8, out_features=16))),
            ("act", Gelu()),
            ("fc2", Linear(LinearConfig(in_features=16, out_features=4))),
        ])
        params = net.init(rng_key, (1, 8))
        p = tmp_path / "seq.mila"
        export_model(p, net, params)
        net2, params2 = load_exported(p)
        x = jax.random.normal(rng_key, (2, 8))
        np.testing.assert_allclose(
            net.apply(params, x), net2.apply(params2, x), rtol=1e-5, atol=1e-6
        )

    def test_unknown_module_rejected(self, tmp_path):
        from mila_tpu.nn.module import Module

        class Custom(Module):
            def apply(self, params, x, **kw):
                return x

        with pytest.raises(ValueError, match="cannot export"):
            export_model(tmp_path / "x.mila", Custom(), {})

    def test_dtype_cast_on_load(self, tmp_path, rng_key):
        model = MLPClassifier(MLPClassifierConfig(hidden_dims=(16,)))
        params = model.init(rng_key, (1, 784))
        p = tmp_path / "m.mila"
        export_model(p, model, params)
        _, params_bf16 = load_exported(p, dtype=jnp.bfloat16)
        assert params_bf16["fc1"]["weight"].dtype == jnp.bfloat16
