"""Benchmark package: shared environment setup.

Importing this package (any `benchmarks.*` module does) enables a persistent
XLA compilation cache under the repo so repeated benchmark runs skip the
slow remote-TPU compiles. /tmp is wiped between driver rounds; `.cache/` in
the repo survives the round and is gitignored.
"""

import os
from pathlib import Path

_CACHE = Path(__file__).resolve().parent.parent / ".cache" / "jax"
_CACHE.mkdir(parents=True, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
