"""Data-layer tests (mirrors Tests/Dnn/Data/DataLoader.cpp)."""

import struct
from pathlib import Path

import numpy as np
import pytest

from mila_tpu.data import (
    ArrayReader,
    CharReader,
    CharVocabulary,
    MnistReader,
    TokenReader,
    load_tiny_shakespeare,
    read_token_file,
    synthetic_mnist,
)
from mila_tpu.data.mnist import read_idx_images, read_idx_labels


class TestArrayReader:
    def test_batching_and_shapes(self):
        x = np.arange(100, dtype=np.float32).reshape(100, 1)
        y = np.arange(100, dtype=np.int32)
        r = ArrayReader(x, y, batch_size=32, shuffle=False)
        assert r.num_batches == 3  # drop_last
        batches = list(r)
        assert len(batches) == 3
        assert batches[0][0].shape == (32, 1)

    def test_no_drop_last(self):
        x = np.zeros((10, 2), np.float32)
        y = np.zeros(10, np.int32)
        r = ArrayReader(x, y, batch_size=4, drop_last=False, shuffle=False)
        assert r.num_batches == 3
        assert list(r)[-1][0].shape == (2, 2)

    def test_shuffle_deterministic_per_epoch(self):
        x = np.arange(64, dtype=np.float32).reshape(64, 1)
        y = np.arange(64, dtype=np.int32)
        r1 = ArrayReader(x, y, batch_size=8, shuffle=True, seed=3)
        r2 = ArrayReader(x, y, batch_size=8, shuffle=True, seed=3)
        np.testing.assert_array_equal(r1.next_batch(0)[1], r2.next_batch(0)[1])
        first = r1.next_batch(0)[1].copy()
        r1.reset()
        assert not np.array_equal(first, r1.next_batch(0)[1])  # new epoch order

    def test_rank_sharding_disjoint(self):
        x = np.arange(100, dtype=np.float32).reshape(100, 1)
        y = np.arange(100, dtype=np.int32)
        seen = []
        for rank in range(4):
            r = ArrayReader(
                x, y, batch_size=5, shuffle=False, process_rank=rank, num_processes=4
            )
            assert len(r) == 25
            seen.append(set(int(t) for _, tb in r for t in tb))
        all_seen = set().union(*seen)
        assert len(all_seen) == 100  # disjoint cover
        with pytest.raises(ValueError):
            ArrayReader(x, y, batch_size=5, process_rank=4, num_processes=4)


class TestMnist:
    def test_idx_round_trip(self, tmp_path):
        # Write a tiny IDX pair and read it back.
        imgs = (np.arange(2 * 28 * 28) % 256).astype(np.uint8)
        img_path = tmp_path / "train-images-idx3-ubyte"
        img_path.write_bytes(struct.pack(">IIII", 2051, 2, 28, 28) + imgs.tobytes())
        lbl_path = tmp_path / "train-labels-idx1-ubyte"
        lbl_path.write_bytes(struct.pack(">II", 2049, 2) + bytes([3, 7]))
        x = read_idx_images(img_path)
        y = read_idx_labels(lbl_path)
        assert x.shape == (2, 784) and x.max() <= 1.0
        np.testing.assert_array_equal(y, [3, 7])

    def test_bad_magic_raises(self, tmp_path):
        p = tmp_path / "train-images-idx3-ubyte"
        p.write_bytes(struct.pack(">IIII", 1234, 1, 28, 28) + bytes(784))
        with pytest.raises(ValueError, match="magic"):
            read_idx_images(p)

    def test_synthetic_learnable_structure(self):
        x, y = synthetic_mnist(n=500, seed=0)
        assert x.shape == (500, 784) and x.min() >= 0 and x.max() <= 1
        assert y.min() >= 0 and y.max() <= 9
        # Same-class examples are closer to their prototype than to others:
        # nearest-centroid classifier should beat 90% easily.
        cents = np.stack([x[y == c].mean(0) for c in range(10)])
        pred = np.argmin(
            ((x[:, None, :] - cents[None]) ** 2).sum(-1), axis=1
        )
        assert (pred == y).mean() > 0.9

    def test_reader_synthetic_fallback(self, tmp_path):
        r = MnistReader(batch_size=16, data_dir=str(tmp_path), synthetic_n=64)
        assert r.is_synthetic
        xb, yb = r.next_batch(0)
        assert xb.shape == (16, 784) and yb.dtype == np.int32

    def test_reader_real_required_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            MnistReader(batch_size=4, data_dir=str(tmp_path), source="real")


class TestTokenReader:
    def test_llmc_format(self, tmp_path):
        toks = np.arange(1000, dtype=np.uint16)
        header = np.zeros(256, np.int32)
        header[0] = 20240520  # magic
        header[1] = 1
        header[2] = len(toks)
        p = tmp_path / "shard.bin"
        p.write_bytes(header.tobytes() + toks.tobytes())
        out = read_token_file(p)
        np.testing.assert_array_equal(out, toks)

    def test_batching_next_token_shift(self, tmp_path):
        toks = np.arange(1000, dtype=np.uint16)
        p = tmp_path / "raw.bin"
        p.write_bytes(toks.tobytes())
        r = TokenReader([p], batch_size=2, seq_len=8)
        x, y = r.next_batch(0)
        assert x.shape == (2, 8)
        np.testing.assert_array_equal(y, x + 1)  # next-token shift on arange

    def test_missing_shards_raise(self):
        with pytest.raises(FileNotFoundError):
            TokenReader("/nonexistent/*.bin", batch_size=2, seq_len=8)


class TestCharReader:
    def test_vocab_round_trip(self):
        v = CharVocabulary(b"hello world")
        ids = v.encode("hello")
        assert v.decode(ids) == "hello"
        assert v.size == len(set(b"hello world"))

    def test_windows_50pct_overlap(self):
        text = bytes(range(65, 91)) * 10  # A..Z repeated
        r = CharReader(text, batch_size=4, seq_len=16, shuffle=False)
        assert r.stride == 8
        x, y = r.next_batch(0)
        assert x.shape == (4, 16)
        # Target is input shifted by one.
        np.testing.assert_array_equal(x[0, 1:], y[0, :-1])

    def test_tiny_shakespeare_available(self):
        data = load_tiny_shakespeare()
        assert data is not None and len(data) > 100_000
        r = CharReader(data[:10000], batch_size=8, seq_len=64)
        x, y = r.next_batch(0)
        assert x.shape == (8, 64) and r.vocab.size > 20
