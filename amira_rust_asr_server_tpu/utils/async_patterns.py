"""Async utility patterns for the serving layer.

Parity with the reference's async toolbox (ref: src/async_patterns.rs):
retry with exponential backoff (ErrorRecoveryManager, :152-192), bounded
task management, and a lightweight performance monitor. The reference's
BatchProcessor evolved into the continuous batcher (runtime/batcher.py).
"""

from __future__ import annotations

import asyncio
import random
import time
from typing import Awaitable, Callable, Optional, Type, TypeVar

from ..reliability import get_logger

log = get_logger("asr.async")
T = TypeVar("T")


class ErrorRecoveryManager:
    """Exponential backoff retry (ref: async_patterns.rs:152-192)."""

    def __init__(self, max_retries: int = 3, base_delay_s: float = 0.1,
                 max_delay_s: float = 5.0, jitter: float = 0.1,
                 retryable: tuple[Type[BaseException], ...] = (Exception,)):
        self.max_retries = max_retries
        self.base_delay_s = base_delay_s
        self.max_delay_s = max_delay_s
        self.jitter = jitter
        self.retryable = retryable

    def delay_for(self, attempt: int) -> float:
        d = min(self.base_delay_s * (2 ** attempt), self.max_delay_s)
        return d * (1.0 + random.uniform(-self.jitter, self.jitter))

    async def run(self, fn: Callable[[], Awaitable[T]]) -> T:
        last: Optional[BaseException] = None
        for attempt in range(self.max_retries + 1):
            try:
                return await fn()
            except self.retryable as e:  # noqa: PERF203
                last = e
                if attempt == self.max_retries:
                    break
                delay = self.delay_for(attempt)
                log.warning("retry %d/%d after %.2fs: %s", attempt + 1,
                            self.max_retries, delay, e)
                await asyncio.sleep(delay)
        assert last is not None
        raise last


class AsyncTaskManager:
    """Bounded concurrent task execution with a global timeout
    (ref: async_patterns.rs AsyncTaskManager)."""

    def __init__(self, max_concurrent: int, timeout_s: float):
        self._sem = asyncio.Semaphore(max_concurrent)
        self.timeout_s = timeout_s

    async def run(self, coro: Awaitable[T]) -> T:
        async with self._sem:
            return await asyncio.wait_for(coro, self.timeout_s)


class PerformanceMonitor:
    """Rolling request latency stats (ref: async_patterns.rs
    PerformanceMonitor)."""

    def __init__(self, window: int = 256):
        self.window = window
        self._samples: list[float] = []
        self.total_requests = 0

    def record_request(self, duration_s: float) -> None:
        self.total_requests += 1
        self._samples.append(duration_s)
        if len(self._samples) > self.window:
            self._samples.pop(0)

    def percentile(self, q: float) -> float:
        if not self._samples:
            return 0.0
        data = sorted(self._samples)
        idx = min(len(data) - 1, int(q / 100.0 * len(data)))
        return data[idx]

    def stats(self) -> dict:
        return {
            "total_requests": self.total_requests,
            "p50_ms": round(self.percentile(50) * 1e3, 2),
            "p95_ms": round(self.percentile(95) * 1e3, 2),
            "p99_ms": round(self.percentile(99) * 1e3, 2),
        }


class Timer:
    """Context-manager wall timer (ref: raii.rs:422, performance_opts.rs
    Timer)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.elapsed_s = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed_s = time.perf_counter() - self._t0
        return False
