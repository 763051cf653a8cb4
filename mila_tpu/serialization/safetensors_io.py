"""HF safetensors reader (pure Python — no dependency on the safetensors
package) and Llama/GPT-2 HF-checkpoint → framework-params mapping.

BASELINE requirement: "HF safetensors loader for Llama/GPT-2 weights"
(SURVEY.md §5 checkpoint plan). Format: u64-LE header length, JSON header
{name: {dtype, shape, data_offsets}}, then a flat byte buffer.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, Optional

import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def _np_dtype(name: str):
    if name == "BF16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    if name in ("F8_E4M3", "F8_E5M2"):
        import ml_dtypes

        return np.dtype(
            ml_dtypes.float8_e4m3fn if name == "F8_E4M3" else ml_dtypes.float8_e5m2
        )
    return np.dtype(_DTYPES[name])


class SafetensorsFile:
    """Lazy reader over one .safetensors file (mmap-backed)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        with open(self.path, "rb") as f:
            (hlen,) = struct.unpack("<Q", f.read(8))
            header = json.loads(f.read(hlen))
        self.metadata = header.pop("__metadata__", {})
        self.entries: dict[str, dict] = header
        self._data_start = 8 + hlen
        self._mm = np.memmap(self.path, dtype=np.uint8, mode="r")

    def keys(self) -> list[str]:
        return sorted(self.entries)

    def read(self, name: str) -> np.ndarray:
        e = self.entries[name]
        lo, hi = e["data_offsets"]
        buf = self._mm[self._data_start + lo: self._data_start + hi]
        arr = np.frombuffer(buf, dtype=_np_dtype(e["dtype"]))
        return arr.reshape(e["shape"])


def load_safetensors(
    path_or_dir: str | Path, pattern: str = "*.safetensors"
) -> dict[str, np.ndarray]:
    """Load all tensors from a file or a sharded directory."""
    p = Path(path_or_dir)
    files = sorted(p.glob(pattern)) if p.is_dir() else [p]
    if not files:
        raise FileNotFoundError(f"no safetensors under {path_or_dir}")
    out: dict[str, np.ndarray] = {}
    for f in files:
        sf = SafetensorsFile(f)
        for k in sf.keys():
            out[k] = sf.read(k)
    return out


def save_safetensors(path: str | Path, tensors: dict[str, np.ndarray]) -> None:
    """Minimal writer (testing + export support)."""
    rev = {np.dtype(v): k for k, v in _DTYPES.items()}
    try:
        import ml_dtypes

        rev[np.dtype(ml_dtypes.bfloat16)] = "BF16"
        rev[np.dtype(ml_dtypes.float8_e4m3fn)] = "F8_E4M3"
        rev[np.dtype(ml_dtypes.float8_e5m2)] = "F8_E5M2"
    except ImportError:
        pass
    header: dict[str, Any] = {}
    off = 0
    blobs = []
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        nb = arr.nbytes
        header[name] = {
            "dtype": rev[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [off, off + nb],
        }
        blobs.append(arr.tobytes())
        off += nb
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)


# ---------------------------------------------------------------------------
# HF → framework param mapping
# ---------------------------------------------------------------------------

def hf_llama_to_params(tensors: dict[str, np.ndarray], num_layers: int) -> dict:
    """Map HF LlamaForCausalLM tensor names to
    :class:`mila_tpu.models.llama.Llama` param structure.

    HF nn.Linear stores weight [out, in]; ours is [in, out] → transpose.
    """

    def t(name):
        return np.ascontiguousarray(tensors[name].T)

    params: dict = {
        "embed": {"wte": tensors["model.embed_tokens.weight"]},
        "norm_f": {"gamma": tensors["model.norm.weight"]},
    }
    if "lm_head.weight" in tensors:
        params["lm_head"] = {"weight": t("lm_head.weight")}
    for i in range(num_layers):
        pre = f"model.layers.{i}"
        params[f"h{i}"] = {
            "ln_attn": {"gamma": tensors[f"{pre}.input_layernorm.weight"]},
            "wq": {"weight": t(f"{pre}.self_attn.q_proj.weight")},
            "wk": {"weight": t(f"{pre}.self_attn.k_proj.weight")},
            "wv": {"weight": t(f"{pre}.self_attn.v_proj.weight")},
            "wo": {"weight": t(f"{pre}.self_attn.o_proj.weight")},
            "ln_mlp": {"gamma": tensors[f"{pre}.post_attention_layernorm.weight"]},
            "gate": {"weight": t(f"{pre}.mlp.gate_proj.weight")},
            "up": {"weight": t(f"{pre}.mlp.up_proj.weight")},
            "down": {"weight": t(f"{pre}.mlp.down_proj.weight")},
        }
    return params


def hf_gpt2_to_params(tensors: dict[str, np.ndarray], num_layers: int) -> dict:
    """Map HF GPT2LMHeadModel names to :class:`mila_tpu.models.gpt2.GPT2`
    params. HF GPT-2 uses Conv1D ([in, out] already — no transpose)."""
    params: dict = {
        "encoder": {"wte": tensors["wte.weight"], "wpe": tensors["wpe.weight"]},
        "ln_f": {"gamma": tensors["ln_f.weight"], "beta": tensors["ln_f.bias"]},
    }
    for i in range(num_layers):
        pre = f"h.{i}"
        params[f"h{i}"] = {
            "ln1": {"gamma": tensors[f"{pre}.ln_1.weight"], "beta": tensors[f"{pre}.ln_1.bias"]},
            "qkv": {
                "weight": tensors[f"{pre}.attn.c_attn.weight"],
                "bias": tensors[f"{pre}.attn.c_attn.bias"],
            },
            "attn": {},
            "proj": {
                "weight": tensors[f"{pre}.attn.c_proj.weight"],
                "bias": tensors[f"{pre}.attn.c_proj.bias"],
            },
            "ln2": {"gamma": tensors[f"{pre}.ln_2.weight"], "beta": tensors[f"{pre}.ln_2.bias"]},
            "mlp": {
                "fc1": {
                    "weight": tensors[f"{pre}.mlp.c_fc.weight"],
                    "bias": tensors[f"{pre}.mlp.c_fc.bias"],
                },
                "act": {},
                "fc2": {
                    "weight": tensors[f"{pre}.mlp.c_proj.weight"],
                    "bias": tensors[f"{pre}.mlp.c_proj.bias"],
                },
            },
        }
    return params
