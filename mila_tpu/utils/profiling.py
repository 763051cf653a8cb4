"""Profiling helpers: JAX trace capture + wall-clock scopes.

SURVEY.md §5 tracing/profiling plan (the reference has only a GBench
harness). ``trace(dir)`` captures an XLA/TensorBoard profile; ``Timer``
gives cheap wall-clock scopes with the delta-timing caveats of remote TPUs
documented in benchmarks/kernel_bench.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

from mila_tpu.utils.logging import Logger


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mila_tpu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        Logger.info("profile trace written to {}", log_dir)


class Timer:
    """Named wall-clock scopes with summary reporting."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def scope(self, name: str, sync: Optional[object] = None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:30s} {t * 1e3:10.2f} ms total  {t / c * 1e3:8.3f} ms/call  x{c}")
        return "\n".join(lines)


def annotate(name: str):
    """Decorator adding a profiler annotation around a function."""

    def deco(fn):
        def wrapped(*a, **kw):
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **kw)

        return wrapped

    return deco
