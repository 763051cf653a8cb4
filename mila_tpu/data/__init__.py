"""Data layer (reference layer 8, SURVEY.md §2.8–2.9 loaders)."""

from mila_tpu.data.bpe import BPETokenizer, derive_merges
from mila_tpu.data.chars import CharReader, CharVocabulary, load_tiny_shakespeare
from mila_tpu.data.loader import ArrayReader, DatasetReader
from mila_tpu.data.prefetch import PrefetchLoader, prefetch_to_device
from mila_tpu.data.mnist import MnistReader, load_mnist, synthetic_mnist
from mila_tpu.data.tokens import TokenReader, read_token_file

__all__ = [
    "BPETokenizer",
    "PrefetchLoader",
    "prefetch_to_device",
    "derive_merges",
    "ArrayReader",
    "DatasetReader",
    "CharReader",
    "CharVocabulary",
    "load_tiny_shakespeare",
    "MnistReader",
    "load_mnist",
    "synthetic_mnist",
    "TokenReader",
    "read_token_file",
]
