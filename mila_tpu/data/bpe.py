"""Byte-level BPE tokenizer: native C++ encode with a pure-python fallback.

Parity: the reference's tokenizer is decode-only (Samples/Gpt2/Src/
Tokenizer.ixx reads gpt2_tokenizer.bin byte strings); its roadmap lists the
encode side. Here encode is implemented twice with identical semantics —
``native/mila_bpe.cpp`` (ctypes-bound, the fast path) and this module's
python fallback — so tests can assert native == python.

Pre-tokenization is an ASCII approximation of the GPT-2 regex
(`'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+`):
bytes >= 0x80 (UTF-8 lead/continuation) classify as letters.

Merge ranks come either from an explicit merges list or are derived from
vocab order (:func:`derive_merges`): in a BPE vocab, token ``t`` was created
by concatenating two earlier tokens; among the valid splits the one whose
parts were created earliest is chosen.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from mila_tpu import native as _native


def _is_letter(b: int) -> bool:
    return 65 <= b <= 90 or 97 <= b <= 122 or b >= 0x80


def _is_digit(b: int) -> bool:
    return 48 <= b <= 57


_SPACE = frozenset(b" \t\n\r\f\v")


def _is_space(b: int) -> bool:
    return b in _SPACE


def _next_pretoken(s: bytes, i: int) -> int:
    """End index of the pre-token starting at ``i`` (mirrors mila_bpe.cpp)."""
    n = len(s)
    if s[i] == 0x27 and i + 1 < n:  # apostrophe contractions
        c1 = s[i + 1] | 0x20
        if c1 in (ord("s"), ord("t"), ord("m"), ord("d")):
            return i + 2
        if i + 2 < n:
            c2 = s[i + 2] | 0x20
            if (c1, c2) in ((ord("r"), ord("e")), (ord("v"), ord("e")),
                            (ord("l"), ord("l"))):
                return i + 3
    j = i
    leading_space = False
    if s[j] == 0x20 and j + 1 < n and not _is_space(s[j + 1]):
        leading_space = True
        j += 1
    if j < n and _is_letter(s[j]):
        while j < n and _is_letter(s[j]):
            j += 1
        return j
    if j < n and _is_digit(s[j]):
        while j < n and _is_digit(s[j]):
            j += 1
        return j
    if j < n and not _is_space(s[j]):
        while j < n and not (_is_space(s[j]) or _is_letter(s[j]) or _is_digit(s[j])):
            j += 1
        return j
    if leading_space:
        return i + 1
    while j < n and _is_space(s[j]):
        j += 1
    return j


def derive_merges(vocab: Sequence[bytes]) -> list[tuple[int, int, int]]:
    """Reconstruct (left, right, merged) merge triples from vocab order.

    Multi-byte tokens are processed in id order; the chosen split is the one
    minimizing max(left_id, right_id) — the parts must predate the merge.
    """
    lookup = {tok: i for i, tok in enumerate(vocab)}
    merges = []
    for tid, tok in enumerate(vocab):
        if len(tok) < 2:
            continue
        best = None
        for cut in range(1, len(tok)):
            a = lookup.get(tok[:cut])
            b = lookup.get(tok[cut:])
            if a is None or b is None or a >= tid or b >= tid:
                continue
            key = (max(a, b), min(a, b))
            if best is None or key < best[0]:
                best = (key, (a, b, tid))
        if best is not None:
            merges.append(best[1])
    return merges


class BPETokenizer:
    """Byte-level BPE with ranked merges.

    ``vocab``: id → byte string (must include all 256 single bytes for
    lossless encoding). ``merges``: (left_id, right_id[, merged_id]) in rank
    order; if absent, derived from vocab order.
    """

    def __init__(self, vocab: Sequence[bytes],
                 merges: Optional[Sequence[tuple]] = None):
        self.vocab = [bytes(t) for t in vocab]
        self._lookup = {t: i for i, t in enumerate(self.vocab)}
        if merges is None:
            triples = derive_merges(self.vocab)
        else:
            triples = []
            for m in merges:
                if len(m) == 3:
                    a, b, mid = m
                else:
                    a, b = m
                    mid = self._lookup.get(self.vocab[a] + self.vocab[b])
                    if mid is None:
                        raise ValueError(
                            f"merged token for pair ({a},{b}) not in vocab"
                        )
                triples.append((int(a), int(b), int(mid)))
        self.merges = triples
        self._ranks = {(a, b): (r, mid) for r, (a, b, mid) in enumerate(triples)}
        self._byte_to_id = [self._lookup.get(bytes([b]), -1) for b in range(256)]
        self._native_handle = None
        self._native_lib = None
        self._init_native()

    # ---------------- native binding ----------------

    def _init_native(self) -> None:
        lib = _native.get_lib()
        if lib is None or not hasattr(lib, "mila_bpe_new"):
            return
        if getattr(lib, "_bpe_bound", False) is False:
            i32p = ctypes.POINTER(ctypes.c_int32)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.mila_bpe_new.restype = ctypes.c_void_p
            lib.mila_bpe_new.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32,
                                         i32p, ctypes.c_int64]
            lib.mila_bpe_encode.restype = ctypes.c_int64
            lib.mila_bpe_encode.argtypes = [ctypes.c_void_p, u8p,
                                            ctypes.c_int64, i32p, ctypes.c_int64]
            lib.mila_bpe_free.restype = None
            lib.mila_bpe_free.argtypes = [ctypes.c_void_p]
            lib._bpe_bound = True
        blob = bytearray()
        for tok in self.vocab:
            blob += len(tok).to_bytes(4, "little") + tok
        blob_np = np.frombuffer(bytes(blob), np.uint8)
        merges_np = np.asarray(self.merges, np.int32).reshape(-1)
        handle = lib.mila_bpe_new(
            blob_np.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            blob_np.size,
            len(self.vocab),
            merges_np.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(self.merges),
        )
        if handle:
            self._native_handle = handle
            self._native_lib = lib

    def __del__(self):
        if self._native_handle and self._native_lib is not None:
            try:
                self._native_lib.mila_bpe_free(self._native_handle)
            except Exception:  # noqa: BLE001 - interpreter teardown
                pass

    # ---------------- encode / decode ----------------

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def encode(self, text: str | bytes, *, use_native: Optional[bool] = None
               ) -> np.ndarray:
        data = text.encode("utf-8") if isinstance(text, str) else bytes(text)
        if not data:
            return np.zeros((0,), np.int32)
        native_ok = self._native_handle is not None
        if use_native is None:
            use_native = native_ok
        if use_native and native_ok:
            buf = np.frombuffer(data, np.uint8)
            out = np.empty(len(data), np.int32)
            n = self._native_lib.mila_bpe_encode(
                self._native_handle,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                buf.size,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                out.size,
            )
            if n >= 0:
                return out[:n].copy()
            # fall through to python on error (e.g. unknown byte)
        return self._encode_py(data)

    def _encode_py(self, data: bytes) -> np.ndarray:
        out: list[int] = []
        i = 0
        n = len(data)
        while i < n:
            j = _next_pretoken(data, i)
            ids = []
            for k in range(i, j):
                bid = self._byte_to_id[data[k]]
                if bid < 0:
                    raise ValueError(f"byte {data[k]:#x} not in vocab")
                ids.append(bid)
            out.extend(self._merge(ids))
            i = j
        return np.asarray(out, np.int32)

    def _merge(self, ids: list[int]) -> list[int]:
        while len(ids) >= 2:
            best = None
            for i in range(len(ids) - 1):
                rm = self._ranks.get((ids[i], ids[i + 1]))
                if rm is not None and (best is None or rm[0] < best[0]):
                    best = (rm[0], i, rm[1])
            if best is None:
                break
            _, i, mid = best
            ids[i:i + 2] = [mid]
        return ids

    def decode(self, ids) -> str:
        return b"".join(
            self.vocab[int(i)] for i in np.asarray(ids).reshape(-1)
            if 0 <= int(i) < len(self.vocab)
        ).decode("utf-8", errors="replace")

    # ---------------- constructors ----------------

    @staticmethod
    def from_llmc_bin(path: str | Path) -> "BPETokenizer":
        """Build an encoder from an llm.c gpt2_tokenizer.bin (decode-only
        vocab; merges derived from vocab order)."""
        from mila_tpu.serialization.llmc import GPT2Tokenizer

        ref = GPT2Tokenizer(path)
        return BPETokenizer(ref.tokens)

    @staticmethod
    def byte_fallback(extra: Sequence[bytes] = ()) -> "BPETokenizer":
        """256 raw bytes (+optional merged tokens appended in merge order)."""
        vocab = [bytes([b]) for b in range(256)] + [bytes(t) for t in extra]
        return BPETokenizer(vocab)
