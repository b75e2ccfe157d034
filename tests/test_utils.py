"""Platform probe, retry/backoff, circuit breaker, shutdown tests."""

import asyncio
import time

import pytest

from amira_rust_asr_server_tpu.errors import CircuitOpenError
from amira_rust_asr_server_tpu.reliability import (CircuitBreaker,
                                                   CircuitState,
                                                   GracefulShutdown)
from amira_rust_asr_server_tpu.utils import (ErrorRecoveryManager,
                                             PerformanceMonitor,
                                             detect_devices, detect_host,
                                             initialize_platform)


# -- platform ---------------------------------------------------------------
def test_detect_host():
    h = detect_host()
    assert h.cpu_count >= 1
    assert h.os in ("linux", "darwin", "windows")


def test_detect_devices_cpu_mesh():
    d = detect_devices()
    assert d.platform == "cpu"
    assert d.n_devices == 8  # virtual mesh from conftest
    assert d.n_processes == 1


def test_initialize_platform_forces_cpu_backend():
    init = initialize_platform()
    assert init.effective_config.inference_backend == "cpu"
    assert init.effective_config.mesh_shape == {"data": 8, "model": 1}


# -- circuit breaker (ref: circuit_breaker.rs state machine) ---------------
def test_breaker_opens_after_threshold():
    t = [0.0]
    cb = CircuitBreaker(failure_threshold=3, window_secs=10,
                        recovery_timeout_secs=5, clock=lambda: t[0])
    assert cb.state is CircuitState.CLOSED
    for _ in range(3):
        cb.record_failure()
    assert cb.state is CircuitState.OPEN
    assert not cb.allow()
    # recovery timeout -> half open
    t[0] = 6.0
    assert cb.state is CircuitState.HALF_OPEN
    assert cb.allow()


def test_breaker_half_open_transitions():
    t = [0.0]
    cb = CircuitBreaker(failure_threshold=1, recovery_timeout_secs=1,
                        success_threshold=2, clock=lambda: t[0])
    cb.record_failure()
    assert cb.state is CircuitState.OPEN
    t[0] = 2.0
    assert cb.state is CircuitState.HALF_OPEN
    cb.record_success()
    assert cb.state is CircuitState.HALF_OPEN
    cb.record_success()
    assert cb.state is CircuitState.CLOSED
    # failure in half-open re-opens immediately
    cb.record_failure()  # closed, 1 failure -> trip (threshold 1)
    assert cb.state is CircuitState.OPEN


def test_breaker_sliding_window():
    t = [0.0]
    cb = CircuitBreaker(failure_threshold=3, window_secs=10,
                        clock=lambda: t[0])
    cb.record_failure()
    cb.record_failure()
    t[0] = 20.0  # old failures age out
    cb.record_failure()
    assert cb.state is CircuitState.CLOSED


def test_breaker_call_sync():
    cb = CircuitBreaker(failure_threshold=1)
    with pytest.raises(ValueError):
        cb.call(lambda: (_ for _ in ()).throw(ValueError("x")))
    with pytest.raises(CircuitOpenError):
        cb.call(lambda: 1)


# -- retry ------------------------------------------------------------------
def test_retry_succeeds_after_failures():
    async def go():
        attempts = []
        mgr = ErrorRecoveryManager(max_retries=3, base_delay_s=0.01)

        async def flaky():
            attempts.append(1)
            if len(attempts) < 3:
                raise RuntimeError("flake")
            return "ok"

        return await mgr.run(flaky), len(attempts)

    result, n = asyncio.run(go())
    assert result == "ok" and n == 3


def test_retry_exhausts():
    async def go():
        mgr = ErrorRecoveryManager(max_retries=2, base_delay_s=0.01)

        async def always_fail():
            raise RuntimeError("nope")

        with pytest.raises(RuntimeError):
            await mgr.run(always_fail)

    asyncio.run(go())


# -- shutdown ---------------------------------------------------------------
def test_graceful_shutdown_drain():
    async def go():
        gs = GracefulShutdown(drain_timeout_secs=2.0)
        done = []

        async def worker():
            async with gs.guard():
                await asyncio.sleep(0.05)
                done.append(1)

        task = asyncio.create_task(worker())
        await asyncio.sleep(0.01)
        gs.trigger()
        assert gs.is_shutting_down
        drained = await gs.drain()
        await task
        return drained, done

    drained, done = asyncio.run(go())
    assert drained and done == [1]


def test_perf_monitor_percentiles():
    pm = PerformanceMonitor()
    for ms in [10, 20, 30, 40, 1000]:
        pm.record_request(ms / 1e3)
    s = pm.stats()
    assert s["total_requests"] == 5
    assert s["p50_ms"] <= s["p95_ms"] <= s["p99_ms"]
