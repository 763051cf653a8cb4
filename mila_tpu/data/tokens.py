"""Tokenized-binary shard reader (llm.c format) for language-model training.

Parity: reference ``Gpt2DataLoader.ixx`` (glob over tokenized ``.bin``
shards, shuffle, ``process_rank``/``num_processes`` distributed sharding
:62-79 — the only distributed artifact in the reference, fully wired here).
Shard format: llm.c v1 header (magic 20240520, uint16 tokens) or raw uint16 /
uint32 token dumps.
"""

from __future__ import annotations

import glob as _glob
import struct
from pathlib import Path
from typing import Optional

import numpy as np

from mila_tpu.data.loader import DatasetReader

LLMC_TOKENS_MAGIC = 20240520


def read_token_file(path: str | Path) -> np.ndarray:
    """Read one token shard → int32 [N] array (native mmap reader when the
    C++ library is available, python fallback otherwise)."""
    path = Path(path)
    if path.suffix != ".gz":
        from mila_tpu import native

        fast = native.read_token_file(str(path))
        if fast is not None:
            return fast
    raw = path.read_bytes()
    if len(raw) >= 1024:
        magic, version = struct.unpack_from("<ii", raw, 0)
        if magic == LLMC_TOKENS_MAGIC:
            # llm.c token file: 256 int32 header then uint16 tokens.
            (ntok,) = struct.unpack_from("<i", raw, 8)
            toks = np.frombuffer(raw, dtype=np.uint16, offset=1024, count=ntok)
            return toks.astype(np.int32)
    # Raw dump fallback: guess uint16 vs int32 by size parity/values.
    if len(raw) % 4 == 0:
        as32 = np.frombuffer(raw, dtype=np.int32)
        if len(as32) == 0 or (as32.min() >= 0 and as32.max() < 1_000_000):
            return as32.copy()
    return np.frombuffer(raw, dtype=np.uint16).astype(np.int32)


class TokenReader(DatasetReader):
    """Yields (inputs [B,T], targets [B,T]) int32 next-token batches from one
    or more token shards, rank-strided."""

    def __init__(
        self,
        pattern: str | list[str | Path],
        batch_size: int,
        seq_len: int,
        *,
        shuffle: bool = False,
        **kw,
    ):
        super().__init__(batch_size, **kw)
        if isinstance(pattern, str):
            files = sorted(_glob.glob(pattern))
        else:
            files = [str(p) for p in pattern]
        if not files:
            raise FileNotFoundError(f"no token shards match {pattern!r}")
        self.seq_len = seq_len
        self.tokens = np.concatenate([read_token_file(f) for f in files])
        if len(self.tokens) < seq_len + 1:
            raise ValueError(
                f"corpus too small: {len(self.tokens)} tokens < seq_len+1={seq_len + 1}"
            )
        self.shuffle = shuffle
        # Windows stride by seq_len; each example needs seq_len+1 tokens.
        n_windows = (len(self.tokens) - 1) // seq_len
        self._starts = (np.arange(n_windows) * seq_len)[self.process_rank:: self.num_processes]
        self._perm: Optional[np.ndarray] = None
        self.reset(0)

    def __len__(self) -> int:
        return len(self._starts)

    def reset(self, epoch: Optional[int] = None) -> None:
        super().reset(epoch)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + 104729 * self._epoch)
            self._perm = rng.permutation(len(self._starts))
        else:
            self._perm = None

    def next_batch(self, index: int):
        lo = index * self.batch_size
        hi = min(lo + self.batch_size, len(self._starts))
        sel = np.arange(lo, hi) if self._perm is None else self._perm[lo:hi]
        starts = self._starts[sel]
        from mila_tpu import native

        fast = native.gather_windows(self.tokens, starts, self.seq_len)
        if fast is not None:
            return fast
        idx = starts[:, None] + np.arange(self.seq_len + 1)[None, :]
        chunk = self.tokens[idx]
        return chunk[:, :-1].astype(np.int32), chunk[:, 1:].astype(np.int32)
