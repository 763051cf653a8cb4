"""Prefetch pipeline tests."""

import threading
import time

import jax
import numpy as np
import pytest

from mila_tpu.data import ArrayReader, PrefetchLoader, prefetch_to_device


def test_yields_all_batches_in_order():
    x = np.arange(40, dtype=np.float32).reshape(20, 2)
    y = np.arange(20, dtype=np.int32)
    reader = ArrayReader(x, y, batch_size=4, shuffle=False)
    direct = [(np.asarray(a), np.asarray(b)) for a, b in reader]
    pre = list(PrefetchLoader(reader, depth=2))
    assert len(pre) == len(direct)
    for (dx, dy), (px, py) in zip(direct, pre):
        np.testing.assert_array_equal(dx, np.asarray(px))
        np.testing.assert_array_equal(dy, np.asarray(py))
        assert isinstance(px, jax.Array)  # landed on device


def test_overlaps_producer(monkeypatch):
    """Producer runs ahead: with depth 3, batch n+1 is ready before the
    consumer finishes batch n."""
    events = []

    def slow_reader():
        for i in range(5):
            events.append(("produced", i, time.monotonic()))
            yield np.full((2,), i, np.float32)

    out = []
    for b in PrefetchLoader(slow_reader(), depth=3, device_put=False):
        time.sleep(0.05)  # simulate device step
        out.append(int(b[0]))
    assert out == list(range(5))
    # All 5 batches were produced before the consumer could have finished
    # (5 * 0.05s of consuming); the producer wasn't gated on consumption.
    produced_span = events[-1][2] - events[0][2]
    assert produced_span < 0.2


def test_error_propagates():
    def bad_reader():
        yield np.zeros(2)
        raise RuntimeError("reader exploded")

    it = iter(PrefetchLoader(bad_reader(), depth=2, device_put=False))
    next(it)
    with pytest.raises(RuntimeError, match="exploded"):
        list(it)


def test_early_stop_joins_worker():
    threads_before = threading.active_count()

    def reader():
        for i in range(1000):
            yield np.zeros(2)

    it = iter(PrefetchLoader(reader(), depth=2, device_put=False))
    next(it)
    it.close()
    time.sleep(0.1)
    assert threading.active_count() <= threads_before + 1


def test_functional_form_with_sharding():
    sh = jax.sharding.SingleDeviceSharding(jax.devices("cpu")[0])
    batches = list(prefetch_to_device([np.ones((4, 2))] * 3, sharding=sh))
    assert len(batches) == 3
    assert batches[0].sharding == sh
