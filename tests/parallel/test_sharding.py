"""Mesh + partition-spec tests on the 8-device virtual CPU mesh
(SURVEY.md §2.10 — the TP/DP capabilities the reference lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mila_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_specs,
    gpt2_param_specs,
    llama_param_specs,
    local_batch_size,
    make_mesh,
    mlp_param_specs,
    shard_tree,
    to_shardings,
)


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(data=4, model=2)
        assert mesh.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}
        mesh2 = make_mesh(model=2)  # auto data
        assert mesh2.shape[DATA_AXIS] == 4

    def test_invalid_mesh(self):
        with pytest.raises(ValueError):
            make_mesh(data=5, model=2)  # 10 > 8

    def test_local_batch(self):
        mesh = make_mesh(data=4, model=2)
        assert local_batch_size(32, mesh) == 8
        with pytest.raises(ValueError):
            local_batch_size(30, mesh)


class TestPartitionSpecs:
    def test_gpt2_specs_cover_tree(self, rng_key):
        from mila_tpu.models.gpt2 import GPT2, GPT2Config

        model = GPT2(GPT2Config(vocab_size=128, max_seq_len=16, num_layers=1,
                                num_heads=2, embedding_dim=32))
        params = model.init(rng_key, (2, 8))
        specs = gpt2_param_specs(params)
        # Column-parallel qkv shards out-features; row-parallel proj shards in.
        assert specs["h0"]["qkv"]["weight"] == P(None, MODEL_AXIS)
        assert specs["h0"]["proj"]["weight"] == P(MODEL_AXIS, None)
        assert specs["h0"]["ln1"]["gamma"] == P()
        assert specs["encoder"]["wte"] == P(MODEL_AXIS, None)
        # Structure matches params exactly.
        assert jax.tree_util.tree_structure(specs) == jax.tree_util.tree_structure(params)

    def test_llama_specs(self, rng_key):
        from mila_tpu.models.llama import Llama, LlamaConfig

        model = Llama(LlamaConfig.tiny(vocab_size=128))
        params = model.init(rng_key, (1, 8))
        specs = llama_param_specs(params)
        assert specs["h0"]["wq"]["weight"] == P(None, MODEL_AXIS)
        assert specs["h0"]["wo"]["weight"] == P(MODEL_AXIS, None)
        assert specs["h0"]["gate"]["weight"] == P(None, MODEL_AXIS)
        assert specs["h0"]["down"]["weight"] == P(MODEL_AXIS, None)
        assert specs["norm_f"]["gamma"] == P()


class TestShardedExecution:
    def test_sharded_gpt2_forward_matches_single(self, rng_key):
        """TP+DP sharded forward == replicated forward, bitwise-close."""
        from mila_tpu.models.gpt2 import GPT2, GPT2Config

        model = GPT2(GPT2Config(vocab_size=128, max_seq_len=16, num_layers=2,
                                num_heads=4, embedding_dim=64))
        params = model.init(rng_key, (4, 8))
        toks = jax.random.randint(rng_key, (4, 8), 0, 128)
        expected = model.apply(params, toks)

        mesh = make_mesh(data=4, model=2)
        sparams = shard_tree(mesh, params, gpt2_param_specs(params))
        stoks = jax.device_put(
            toks, to_shardings(mesh, batch_specs({"x": None})["x"])
        )
        with mesh:
            out = jax.jit(model.apply)(sparams, stoks)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=2e-4, atol=1e-4
        )

    def test_sharded_training_step_runs(self, rng_key):
        """DP+TP train step executes and produces finite loss + sharded grads."""
        from mila_tpu.models.llama import Llama, LlamaConfig
        from mila_tpu.optim import AdamW, AdamWConfig
        from mila_tpu.ops import softmax_cross_entropy

        model = Llama(LlamaConfig.tiny(vocab_size=128))
        params = model.init(rng_key, (4, 8))
        mesh = make_mesh(data=4, model=2)
        sparams = shard_tree(mesh, params, llama_param_specs(params))
        opt = AdamW(AdamWConfig(learning_rate=1e-3))
        opt_state = opt.init(sparams)
        toks = jax.random.randint(rng_key, (4, 8), 0, 128)
        tgts = jnp.roll(toks, -1, 1)

        @jax.jit
        def step(params, opt_state, toks, tgts):
            loss, grads = jax.value_and_grad(
                lambda p: softmax_cross_entropy(model.apply(p, toks), tgts).mean()
            )(params)
            params, opt_state = opt.step(opt_state, params, grads)
            return params, opt_state, loss

        with mesh:
            sparams2, opt_state, loss = step(sparams, opt_state, toks, tgts)
        assert np.isfinite(float(loss))
        # Params kept their shardings through the update.
        w = sparams2["h0"]["wq"]["weight"]
        assert not w.sharding.is_fully_replicated

    def test_sharded_kv_decode(self, rng_key):
        """TP-sharded KV-cache decode matches replicated decode."""
        from mila_tpu.models.llama import Llama, LlamaConfig
        from mila_tpu.parallel import kv_cache_specs

        model = Llama(LlamaConfig.tiny(vocab_size=128))
        params = model.init(rng_key, (2, 8))
        toks = jax.random.randint(rng_key, (2, 8), 0, 128)
        cache = model.init_kv_cache(2, 16, jnp.float32)
        logits_ref, cache_ref = model.forward_with_cache(params, toks, cache, 0)

        mesh = make_mesh(data=2, model=2)
        sparams = shard_tree(mesh, params, llama_param_specs(params))
        scache = shard_tree(mesh, cache, kv_cache_specs(cache))
        with mesh:
            logits, _ = jax.jit(
                lambda p, t, c: model.forward_with_cache(p, t, c, 0)
            )(sparams, toks, scache)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_ref), rtol=2e-4, atol=1e-4
        )
