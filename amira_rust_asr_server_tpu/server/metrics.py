"""Service metrics.

Two systems, matching the reference (SURVEY.md §5 observability):
- :class:`ServiceMetrics` — lightweight JSON counters served at /metrics
  (ref: src/server/metrics.rs:11-117)
- :class:`PrometheusMetrics` — prometheus_client registry with the richer
  series set (ref: src/reliability/metrics.rs:44-160), exposition at
  /metrics when config.metrics_backend == "prometheus".
"""

from __future__ import annotations

import threading
import time
from typing import Any, Dict, Optional


class ServiceMetrics:
    """Atomic-ish counters (GIL-protected + lock for read-modify-write)."""

    def __init__(self, max_streams: int, max_batches: int):
        self._lock = threading.Lock()
        self.start_time = time.time()
        self.max_streams = max_streams
        self.max_batches = max_batches
        self.active_streams = 0
        self.active_batches = 0
        self.total_streams = 0
        self.total_batches = 0
        self.rejections = 0
        self.errors = 0

    def increment_stream(self) -> None:
        with self._lock:
            self.active_streams += 1
            self.total_streams += 1

    def decrement_stream(self) -> None:
        with self._lock:
            self.active_streams = max(0, self.active_streams - 1)

    def increment_batch(self) -> None:
        with self._lock:
            self.active_batches += 1
            self.total_batches += 1

    def decrement_batch(self) -> None:
        with self._lock:
            self.active_batches = max(0, self.active_batches - 1)

    def record_rejection(self) -> None:
        with self._lock:
            self.rejections += 1

    def record_error(self) -> None:
        with self._lock:
            self.errors += 1

    def reset_batch_count(self) -> None:
        """Zombie-request reset (ref: handlers.rs:237-243)."""
        with self._lock:
            self.active_batches = 0

    def to_json(self) -> Dict[str, Any]:
        with self._lock:
            return {
                "active_streams": self.active_streams,
                "max_streams": self.max_streams,
                "active_batches": self.active_batches,
                "max_batches": self.max_batches,
                "total_streams": self.total_streams,
                "total_batches": self.total_batches,
                "rejections": self.rejections,
                "errors": self.errors,
                "uptime_seconds": round(time.time() - self.start_time, 1),
            }


class PrometheusMetrics:
    """Richer series (requests, latency histograms, device-loop health)."""

    def __init__(self, metrics: ServiceMetrics):
        from prometheus_client import (CollectorRegistry, Counter, Gauge,
                                       Histogram)
        self.registry = CollectorRegistry()
        self._svc = metrics
        self.requests_total = Counter(
            "asr_requests_total", "Total ASR requests",
            ["kind", "status"], registry=self.registry)
        self.inference_duration = Histogram(
            "asr_inference_duration_seconds",
            "End-to-end inference latency",
            ["kind"], registry=self.registry,
            buckets=(.005, .01, .025, .05, .1, .25, .5, 1, 2.5, 5, 10))
        self.audio_seconds_total = Counter(
            "asr_audio_seconds_total", "Seconds of audio processed",
            registry=self.registry)
        self.active_streams = Gauge(
            "asr_active_streams", "Active WebSocket streams",
            registry=self.registry)
        self.active_batches = Gauge(
            "asr_active_batches", "Active batch requests",
            registry=self.registry)
        self.websocket_messages = Counter(
            "asr_websocket_messages_total", "WebSocket messages",
            ["direction"], registry=self.registry)
        self.batch_lanes = Histogram(
            "asr_batch_lanes", "Lanes per device dispatch",
            registry=self.registry, buckets=(1, 2, 4, 8, 16, 32))
        self.circuit_state = Gauge(
            "asr_circuit_breaker_state",
            "0=closed 1=half-open 2=open", registry=self.registry)
        self.compile_count = Counter(
            "asr_xla_compilations_total", "XLA program compilations",
            registry=self.registry)

    def observe_request(self, kind: str, status: str,
                        duration_s: Optional[float] = None,
                        audio_s: Optional[float] = None) -> None:
        self.requests_total.labels(kind=kind, status=status).inc()
        if duration_s is not None:
            self.inference_duration.labels(kind=kind).observe(duration_s)
        if audio_s is not None:
            self.audio_seconds_total.inc(audio_s)

    def sync_gauges(self) -> None:
        self.active_streams.set(self._svc.active_streams)
        self.active_batches.set(self._svc.active_batches)

    def exposition(self) -> bytes:
        from prometheus_client import generate_latest
        self.sync_gauges()
        return generate_latest(self.registry)
