"""Native C++ IO library tests (ctypes binding vs python fallbacks)."""

import struct

import numpy as np
import pytest

from mila_tpu import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library unavailable (no toolchain)")
    return native.get_lib()


class TestNativeIO:
    def test_version(self, lib):
        assert lib.mila_io_version() >= 1

    def test_idx_round_trip(self, lib, tmp_path):
        imgs = (np.arange(3 * 784) % 256).astype(np.uint8)
        p = tmp_path / "imgs"
        p.write_bytes(struct.pack(">IIII", 2051, 3, 28, 28) + imgs.tobytes())
        out = native.read_idx_images(str(p))
        assert out.shape == (3, 784)
        np.testing.assert_allclose(out[0, :5], imgs[:5] / 255.0, rtol=1e-6)

        lp = tmp_path / "labels"
        lp.write_bytes(struct.pack(">II", 2049, 4) + bytes([1, 2, 3, 4]))
        labels = native.read_idx_labels(str(lp))
        np.testing.assert_array_equal(labels, [1, 2, 3, 4])

    def test_bad_magic_returns_none(self, lib, tmp_path):
        p = tmp_path / "bad"
        p.write_bytes(struct.pack(">IIII", 9999, 1, 28, 28) + bytes(784))
        assert native.read_idx_images(str(p)) is None

    def test_llmc_token_file(self, lib, tmp_path):
        toks = (np.arange(5000) % 50257).astype(np.uint16)
        header = np.zeros(256, np.int32)
        header[0], header[1], header[2] = 20240520, 1, len(toks)
        p = tmp_path / "shard.bin"
        p.write_bytes(header.tobytes() + toks.tobytes())
        out = native.read_token_file(str(p))
        np.testing.assert_array_equal(out, toks.astype(np.int32))

    def test_raw_i32_token_file(self, lib, tmp_path):
        toks = np.arange(2000, dtype=np.int32)
        p = tmp_path / "raw.bin"
        p.write_bytes(toks.tobytes())
        out = native.read_token_file(str(p))
        np.testing.assert_array_equal(out, toks)

    def test_gather_windows_matches_numpy(self, lib):
        tokens = np.arange(1000, dtype=np.int32)
        starts = np.array([0, 17, 500], np.int64)
        x, y = native.gather_windows(tokens, starts, 32)
        assert x.shape == (3, 32)
        np.testing.assert_array_equal(x[1], tokens[17:49])
        np.testing.assert_array_equal(y, x + 1)

    def test_lut_encode(self, lib):
        lut = np.zeros(256, np.int32)
        lut[ord("a")] = 1
        lut[ord("b")] = 2
        out = native.lut_encode(b"abba", lut)
        np.testing.assert_array_equal(out, [1, 2, 2, 1])


class TestReaderIntegration:
    def test_token_reader_uses_native(self, tmp_path):
        """TokenReader output identical whether native path is active or not."""
        toks = (np.arange(5000) % 777).astype(np.uint16)
        p = tmp_path / "t.bin"
        header = np.zeros(256, np.int32)
        header[0], header[1], header[2] = 20240520, 1, len(toks)
        p.write_bytes(header.tobytes() + toks.tobytes())

        from mila_tpu.data import TokenReader

        r = TokenReader([p], batch_size=4, seq_len=16)
        x, y = r.next_batch(0)
        np.testing.assert_array_equal(x[0], toks[:16].astype(np.int32))
        np.testing.assert_array_equal(y[0], toks[1:17].astype(np.int32))
