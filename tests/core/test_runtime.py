"""Runtime tests: device discovery, execution context, precision, memory
(mirrors reference Tests/Dnn/Compute/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mila_tpu.runtime import (
    DeviceKind,
    ExecutionContext,
    MemoryTracker,
    PrecisionPolicy,
    default_context,
    device_memory_stats,
    format_bytes,
    get_device,
    list_devices,
    resolve,
    tree_nbytes,
)


class TestDeviceDiscovery:
    def test_list_devices_nonempty(self):
        assert len(list_devices()) >= 1

    def test_eight_virtual_cpu_devices(self):
        # conftest forces --xla_force_host_platform_device_count=8.
        assert len(list_devices(DeviceKind.CPU)) == 8

    def test_get_device_by_name(self):
        d = get_device("cpu:1")
        assert d.platform == "cpu" and d.id == 1

    def test_get_device_auto(self):
        assert get_device("auto") is not None

    def test_bad_specs(self):
        with pytest.raises(ValueError):
            get_device("cpu:99")
        with pytest.raises(ValueError):
            DeviceKind.from_string("quantum")

    def test_cuda_alias(self):
        assert DeviceKind.from_string("cuda") == DeviceKind.GPU


class TestExecutionContext:
    def test_put_and_synchronize(self):
        ctx = ExecutionContext("cpu:2")
        x = ctx.put(np.arange(6.0).reshape(2, 3))
        assert x.devices() == {get_device("cpu:2")}
        ctx.synchronize(x)
        ctx.synchronize()

    def test_props(self):
        p = ExecutionContext("cpu").props()
        assert p.platform == "cpu"

    def test_default_context(self):
        assert default_context().device is not None


class TestPrecision:
    def test_policies(self):
        perf = resolve(PrecisionPolicy.PERFORMANCE)
        assert perf.param_dtype == jnp.bfloat16 and perf.accum_dtype == jnp.float32
        acc = resolve(PrecisionPolicy.ACCURACY)
        assert acc.compute_dtype == jnp.float32
        auto_cpu = resolve(PrecisionPolicy.AUTO, on_accelerator=False)
        assert auto_cpu.compute_dtype == jnp.float32
        auto_tpu = resolve(PrecisionPolicy.AUTO, on_accelerator=True)
        assert auto_tpu.compute_dtype == jnp.bfloat16
        nat = resolve(PrecisionPolicy.NATIVE, native_dtype=jnp.float16)
        assert nat.param_dtype == jnp.float16

    def test_from_string(self):
        assert PrecisionPolicy.from_string("performance") == PrecisionPolicy.PERFORMANCE
        with pytest.raises(ValueError):
            PrecisionPolicy.from_string("fast")


class TestMemory:
    def test_tree_nbytes(self):
        tree = {"w": jnp.zeros((4, 4), jnp.float32), "b": jnp.zeros((4,), jnp.bfloat16)}
        assert tree_nbytes(tree) == 4 * 4 * 4 + 4 * 2

    def test_tracker_peak(self):
        t = MemoryTracker()
        a = jnp.zeros((10,), jnp.float32)
        t.record_alloc(a)
        assert t.stats.live_bytes == 40
        t.record_free(a)
        assert t.stats.live_bytes == 0
        assert t.stats.peak_bytes == 40
        assert t.stats.allocation_count == 1

    def test_format_bytes(self):
        assert format_bytes(1024) == "1.00 KiB"
        assert format_bytes(3 * 1024**3) == "3.00 GiB"

    def test_device_memory_stats_no_crash(self):
        device_memory_stats()  # may be None on CPU — just must not raise
