"""llm.c checkpoint + tokenizer + safetensors format tests."""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.models.gpt2 import GPT2, GPT2Config
from mila_tpu.serialization.llmc import (
    GPT2Tokenizer,
    read_gpt2_checkpoint,
    write_gpt2_checkpoint,
)
from mila_tpu.serialization.safetensors_io import (
    SafetensorsFile,
    load_safetensors,
    save_safetensors,
)


class TestLlmcCheckpoint:
    def test_round_trip_forward_equivalence(self, tmp_path):
        cfg = GPT2Config(vocab_size=50, padded_vocab_size=64, max_seq_len=16,
                         num_layers=2, num_heads=2, embedding_dim=16)
        model = GPT2(cfg)
        params = model.init(jax.random.key(0), (1, 8))
        path = tmp_path / "gpt2.bin"
        write_gpt2_checkpoint(path, cfg, params)
        cfg2, params2 = read_gpt2_checkpoint(path)
        assert cfg2.num_layers == 2 and cfg2.vp == 64 and cfg2.vocab_size == 50
        toks = jnp.array([[1, 2, 3, 4]], jnp.int32)
        model2 = GPT2(cfg2)
        l1 = model.apply(params, toks)
        l2 = model2.apply(jax.tree_util.tree_map(jnp.asarray, params2), toks)
        np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-6)

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "bad.bin"
        p.write_bytes(np.zeros(256, "<i4").tobytes())
        with pytest.raises(ValueError, match="magic"):
            read_gpt2_checkpoint(p)

    def test_tokenizer_reader(self, tmp_path):
        header = np.zeros(256, "<i4")
        header[0] = 20240328
        header[1] = 2
        header[2] = 3  # vocab
        header[3] = 2  # eot
        body = b""
        for tok in [b"he", b"llo", b"!"]:
            body += struct.pack("<B", len(tok)) + tok
        p = tmp_path / "tok.bin"
        p.write_bytes(header.tobytes() + body)
        tk = GPT2Tokenizer(p)
        assert tk.vocab_size == 3 and tk.eot_token == 2
        assert tk.decode([0, 1, 2]) == "hello!"


class TestSafetensors:
    def test_round_trip_dtypes(self, tmp_path):
        import ml_dtypes

        tensors = {
            "a": np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32),
            "b": np.arange(8, dtype=np.int8),
            "c": np.ones((2, 2), ml_dtypes.bfloat16),
        }
        p = tmp_path / "t.safetensors"
        save_safetensors(p, tensors)
        back = load_safetensors(p)
        for k in tensors:
            np.testing.assert_array_equal(back[k], tensors[k])
            assert back[k].dtype == tensors[k].dtype

    def test_lazy_reader_keys(self, tmp_path):
        p = tmp_path / "x.safetensors"
        save_safetensors(p, {"w": np.zeros((4,), np.float32)})
        sf = SafetensorsFile(p)
        assert sf.keys() == ["w"]
        assert sf.read("w").shape == (4,)

    def test_missing_file(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_safetensors(tmp_path)
