"""Async host→device prefetch pipeline.

Parity+: the reference's loaders are synchronous host readers whose batches
are copied H2D inside the training loop (Mnist.cpp:429-465 — the copy sits
on the hot path; its pinned-memory resource exists to make exactly that
copy faster, CudaPinnedMemoryResource.ixx:90). TPU-native version: a
background thread runs the (native-accelerated) reader and eagerly
``jax.device_put``s the next ``depth`` batches while the current step
computes — XLA's async dispatch means the transfer overlaps device compute
with no stream plumbing.

Works with any :class:`mila_tpu.data.DatasetReader` or plain iterable of
numpy pytrees.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator, Optional

import jax

_SENTINEL = object()


class PrefetchLoader:
    """Wraps a batch iterable; yields device-resident batches ``depth`` ahead.

    ``sharding``: optional `jax.sharding.Sharding` (or device) for the
    placement — pass the data-parallel sharding so each batch lands
    pre-sharded across the mesh.
    """

    def __init__(self, reader: Iterable, *, depth: int = 2,
                 sharding: Optional[Any] = None, device_put: bool = True):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.reader = reader
        self.depth = depth
        self.sharding = sharding
        self.device_put = device_put
        self._err: Optional[BaseException] = None

    def _put(self, batch):
        if not self.device_put:
            return batch
        if self.sharding is not None:
            return jax.device_put(batch, self.sharding)
        return jax.device_put(batch)

    def __iter__(self) -> Iterator[Any]:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def worker():
            try:
                for batch in self.reader:
                    if stop.is_set():
                        return
                    # device_put on the worker thread: the H2D transfer is
                    # issued (async) before the consumer asks for the batch.
                    q.put(self._put(batch))
            except BaseException as e:  # noqa: BLE001 - forwarded to consumer
                self._err = e
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=worker, name="mila-prefetch", daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    if self._err is not None:
                        raise self._err
                    return
                yield item
        finally:
            stop.set()
            # Drain so the worker's blocked put() can finish and exit.
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5)


def prefetch_to_device(reader: Iterable, depth: int = 2,
                       sharding: Optional[Any] = None) -> Iterator[Any]:
    """Functional form: ``for batch in prefetch_to_device(reader): ...``"""
    return iter(PrefetchLoader(reader, depth=depth, sharding=sharding))
