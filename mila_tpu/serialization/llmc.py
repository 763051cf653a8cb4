"""llm.c binary checkpoint + tokenizer ingestion for GPT-2.

Parity: reference ``Gpt2Model`` llm.c loader (Samples/Gpt2/Src/Gpt2Model.ixx:
164-196: magic 20240326, header[256] int32 with maxT/V/Vp/L/NH/C, raw FP32
param tensors in llm.c order) and ``Tokenizer`` (Tokenizer.ixx: reads
gpt2_tokenizer.bin, magic 20240328). llm.c stores Linear weights [out, in]
row-major; our layout is [in, out] (MXU-direct), so projection weights are
transposed on load.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import BinaryIO

import numpy as np

GPT2_MODEL_MAGIC = 20240326
TOKENIZER_MAGIC = 20240328


def _read_f32(f: BinaryIO, *shape: int) -> np.ndarray:
    n = int(np.prod(shape))
    data = np.frombuffer(f.read(n * 4), dtype="<f4", count=n)
    return data.reshape(shape).copy()


def read_gpt2_checkpoint(path: str | Path):
    """Read an llm.c gpt2_124M.bin-style checkpoint.

    Returns (config_dict, params) where params matches
    :class:`mila_tpu.models.gpt2.GPT2` param structure (tied embeddings).
    """
    from mila_tpu.models.gpt2 import GPT2Config

    with open(path, "rb") as f:
        header = np.frombuffer(f.read(256 * 4), dtype="<i4")
        if header[0] != GPT2_MODEL_MAGIC:
            raise ValueError(f"{path}: bad magic {header[0]} (want {GPT2_MODEL_MAGIC})")
        version = int(header[1])
        maxT, V, L, NH, C = (int(x) for x in header[2:7])
        Vp = int(header[7]) if version >= 3 and header[7] > 0 else V

        cfg = GPT2Config(
            name="gpt2-llmc",
            vocab_size=V,
            padded_vocab_size=Vp,
            max_seq_len=maxT,
            num_layers=L,
            num_heads=NH,
            embedding_dim=C,
            tie_embeddings=True,
        )

        # llm.c parameter order (train_gpt2.c): wte, wpe, then stacked per
        # layer: ln1w ln1b qkvw qkvb attprojw attprojb ln2w ln2b fcw fcb
        # fcprojw fcprojb, then lnfw lnfb.
        wte = _read_f32(f, Vp, C)
        wpe = _read_f32(f, maxT, C)
        ln1w = _read_f32(f, L, C)
        ln1b = _read_f32(f, L, C)
        qkvw = _read_f32(f, L, 3 * C, C)
        qkvb = _read_f32(f, L, 3 * C)
        projw = _read_f32(f, L, C, C)
        projb = _read_f32(f, L, C)
        ln2w = _read_f32(f, L, C)
        ln2b = _read_f32(f, L, C)
        fcw = _read_f32(f, L, 4 * C, C)
        fcb = _read_f32(f, L, 4 * C)
        fcprojw = _read_f32(f, L, C, 4 * C)
        fcprojb = _read_f32(f, L, C)
        lnfw = _read_f32(f, C)
        lnfb = _read_f32(f, C)

    params = {
        "encoder": {"wte": wte, "wpe": wpe},
        "ln_f": {"gamma": lnfw, "beta": lnfb},
    }
    for i in range(L):
        params[f"h{i}"] = {
            "ln1": {"gamma": ln1w[i], "beta": ln1b[i]},
            "qkv": {"weight": qkvw[i].T.copy(), "bias": qkvb[i]},
            "attn": {},
            "proj": {"weight": projw[i].T.copy(), "bias": projb[i]},
            "ln2": {"gamma": ln2w[i], "beta": ln2b[i]},
            "mlp": {
                "fc1": {"weight": fcw[i].T.copy(), "bias": fcb[i]},
                "act": {},
                "fc2": {"weight": fcprojw[i].T.copy(), "bias": fcprojb[i]},
            },
        }
    return cfg, params


def write_gpt2_checkpoint(path: str | Path, cfg, params) -> None:
    """Inverse of :func:`read_gpt2_checkpoint` (round-trip/testing support)."""
    L, C = cfg.num_layers, cfg.embedding_dim
    header = np.zeros(256, "<i4")
    header[0] = GPT2_MODEL_MAGIC
    header[1] = 3
    header[2:8] = [cfg.max_seq_len, cfg.vocab_size, L, cfg.num_heads, C, cfg.vp]

    def w(f, arr):
        f.write(np.ascontiguousarray(arr, "<f4").tobytes())

    with open(path, "wb") as f:
        f.write(header.tobytes())
        w(f, params["encoder"]["wte"])
        w(f, params["encoder"]["wpe"])
        for name in ["ln1.gamma", "ln1.beta"]:
            w(f, np.stack([_get(params[f"h{i}"], name) for i in range(L)]))
        w(f, np.stack([np.asarray(params[f"h{i}"]["qkv"]["weight"]).T for i in range(L)]))
        w(f, np.stack([_get(params[f"h{i}"], "qkv.bias") for i in range(L)]))
        w(f, np.stack([np.asarray(params[f"h{i}"]["proj"]["weight"]).T for i in range(L)]))
        w(f, np.stack([_get(params[f"h{i}"], "proj.bias") for i in range(L)]))
        for name in ["ln2.gamma", "ln2.beta"]:
            w(f, np.stack([_get(params[f"h{i}"], name) for i in range(L)]))
        w(f, np.stack([np.asarray(params[f"h{i}"]["mlp"]["fc1"]["weight"]).T for i in range(L)]))
        w(f, np.stack([_get(params[f"h{i}"], "mlp.fc1.bias") for i in range(L)]))
        w(f, np.stack([np.asarray(params[f"h{i}"]["mlp"]["fc2"]["weight"]).T for i in range(L)]))
        w(f, np.stack([_get(params[f"h{i}"], "mlp.fc2.bias") for i in range(L)]))
        w(f, params["ln_f"]["gamma"])
        w(f, params["ln_f"]["beta"])


def _get(tree: dict, dotted: str):
    for k in dotted.split("."):
        tree = tree[k]
    return np.asarray(tree)


class GPT2Tokenizer:
    """Reads llm.c gpt2_tokenizer.bin (Tokenizer.ixx parity): magic 20240328,
    version, vocab_size, then length-prefixed byte strings. Decode-only (the
    reference is decode-only too)."""

    def __init__(self, path: str | Path):
        raw = Path(path).read_bytes()
        header = np.frombuffer(raw[: 256 * 4], dtype="<i4")
        if header[0] != TOKENIZER_MAGIC:
            raise ValueError(f"bad tokenizer magic {header[0]}")
        version = int(header[1])
        self.vocab_size = int(header[2])
        self.eot_token = int(header[3]) if version >= 2 else 50256
        self.tokens: list[bytes] = []
        off = 256 * 4
        for _ in range(self.vocab_size):
            (length,) = struct.unpack_from("<B", raw, off)
            off += 1
            self.tokens.append(raw[off: off + length])
            off += length

    def decode(self, ids) -> str:
        return b"".join(
            self.tokens[int(i)] for i in ids if 0 <= int(i) < self.vocab_size
        ).decode("utf-8", errors="replace")
