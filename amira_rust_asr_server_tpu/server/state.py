"""Application state: DI container for the serving layer.

Parity with the reference's AppState (ref: src/server/state.rs:16-62):
pipeline, vocabulary, metrics, stream/batch admission semaphores, active
stream registry — plus the TPU additions: a dedicated device-dispatch
executor (the analogue of the reference's specialized tokio runtimes,
ref: src/performance/specialized_pools.rs:14-140), circuit breaker and
graceful shutdown wired in.
"""

from __future__ import annotations

import concurrent.futures
from typing import Dict, Optional

from ..config import Config
from ..reliability import CircuitBreaker, GracefulShutdown
from ..runtime import AsrPipeline
from ..vocab import Vocabulary
from .metrics import PrometheusMetrics, ServiceMetrics


class TryAcquireSemaphore:
    """Counting semaphore with non-blocking acquire (the reference rejects
    with 503 instead of queueing, ref: handlers.rs:176-179). Safe without a
    lock: only touched from the event-loop thread."""

    def __init__(self, limit: int):
        self.limit = limit
        self._held = 0

    def try_acquire(self) -> bool:
        if self._held >= self.limit:
            return False
        self._held += 1
        return True

    def release(self) -> None:
        self._held = max(0, self._held - 1)

    @property
    def available(self) -> int:
        return self.limit - self._held


class AppState:
    def __init__(self, pipeline: AsrPipeline, vocab: Vocabulary,
                 config: Optional[Config] = None):
        self.config = config or pipeline.config
        self.pipeline = pipeline
        self.vocab = vocab
        self.metrics = ServiceMetrics(
            self.config.max_concurrent_streams,
            self.config.max_concurrent_batches)
        self.prometheus: Optional[PrometheusMetrics] = None
        if self.config.metrics_backend == "prometheus":
            self.prometheus = PrometheusMetrics(self.metrics)
        self.stream_semaphore = TryAcquireSemaphore(
            self.config.max_concurrent_streams)
        self.batch_semaphore = TryAcquireSemaphore(
            self.config.max_concurrent_batches)
        self.active_streams: Dict[str, object] = {}
        # load-shed rejections from the admission queue must not count as
        # device failures, or a traffic burst trips the breaker and turns
        # graceful 503s into a 30 s full outage
        from ..errors import CapacityExceededError
        self.breaker = CircuitBreaker(
            excluded_exceptions=(CapacityExceededError,))
        self.shutdown = GracefulShutdown()
        # live-reload surface (runtime/reload.py): which repository model
        # is serving, and a guard against concurrent swaps
        import threading as _threading
        self.loaded_model: Optional[dict] = None
        if self.config.checkpoint_path:
            self.loaded_model = {"name": None,
                                 "checkpoint": self.config.checkpoint_path}
        self._reload_lock = _threading.Lock()
        # optional host-core partitioning: dedicate a core to the device
        # feeder, keep sessions off it (ref: affinity_management.rs — the
        # reference's pools take the same thread-type split)
        from ..utils.affinity import AffinityPlan, ThreadType, make_initializer
        self.affinity_plan = None
        if (self.config.enable_platform_optimizations
                and self.config.enable_cpu_affinity):
            self.affinity_plan = AffinityPlan.plan()
            from ..reliability import get_logger
            get_logger("asr.affinity").info(
                "affinity plan", extra={"fields": {
                    "enabled": self.affinity_plan.enabled,
                    "reason": self.affinity_plan.reason,
                    "assignments": {t.value: list(c) for t, c in
                                    self.affinity_plan.assignments.items()},
                }})
        _plan = self.affinity_plan or AffinityPlan(False, "affinity off")
        # single dispatch thread: XLA executions for one chip serialize
        # anyway; a second thread only adds contention. IO stays on the
        # event loop (the reference's io/inference runtime split).
        self.inference_executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="device-dispatch",
            initializer=make_initializer(_plan, ThreadType.DISPATCH))
        # session threads run per-stream CPU work (weaving, buffering) and
        # block on the batcher while their chunk rides a shared device
        # batch — one thread per admissible stream
        self.session_executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=self.config.max_concurrent_streams + 2,
            thread_name_prefix="stream-session",
            initializer=make_initializer(_plan, ThreadType.SESSION))
        from ..runtime.batcher import ContinuousBatcher
        self.batcher = ContinuousBatcher(pipeline, self.inference_executor)

        # live observability wiring: lanes-per-dispatch histogram, XLA
        # compile counter, breaker-state gauge (the reference declares
        # these series in metrics.rs:44-160; here they actually update)
        if self.prometheus:
            self.batcher.prometheus = self.prometheus
            pipeline.on_compile = self.prometheus.compile_count.inc
            pipeline.on_beam_path = (
                lambda p: self.prometheus.beam_path.labels(path=p).inc())
            self.breaker.on_state_change = self._on_breaker_state
            self.prometheus.staging_size_fn = lambda: len(pipeline._staging)
            self.prometheus.queue_depth_fn = self.batcher.queue_depth

        # native streaming mode: one shared lane engine batches all
        # concurrent streams into a single fused chunk-step program
        self.lane_engine = None
        self.lane_lock = None
        if (self.config.streaming_mode == "native"
                and pipeline.model.config.causal):
            import threading
            from ..runtime.lane_engine import StreamingLaneEngine
            self.lane_engine = StreamingLaneEngine(
                pipeline.model, pipeline.params, vocab,
                n_lanes=self.config.max_lanes,
                chunk_frames=self.config.native_chunk_frames,
                norm=self.config.native_norm,
                max_symbols=self.config.max_symbols_per_step,
                max_total=self.config.max_total_tokens,
                mesh=pipeline.mesh)
            self.lane_lock = threading.Lock()
            if self.prometheus:
                self.lane_engine.prometheus = self.prometheus
                self.prometheus.lane_live_fn = \
                    lambda: self.lane_engine.live_lanes
            # Dedicated tick loop: ONE thread advances the engine whenever
            # any lane has a buffered chunk. Session threads only feed and
            # read transcripts — they never dispatch. The round-5 native
            # loadtest showed why: with session threads ticking inline
            # under lane_lock, 16 streams formed a lock convoy (one
            # tick ≈ a full dispatch+readback RTT), work items blew the
            # 5 s partial budget, the timeout killed the stream, and the
            # reconnect storm kept every lane too young to batch
            # (mean_lanes_per_tick 1.0, 656 sessions / 16 clients). A
            # single ticker batches ALL ready lanes into each fused step,
            # which is the design point of the lane engine.
            self._lane_ticker_stop = threading.Event()

            def _tick_loop():
                while not self._lane_ticker_stop.is_set():
                    # re-read each pass: a hot reload (runtime/reload.py)
                    # installs a fresh engine on the new weights
                    eng = self.lane_engine
                    did = False
                    # pending() reads host lists racily; tick() recomputes
                    # readiness under the lock, so a stale view only costs
                    # one 5 ms sleep
                    if eng.pending():
                        with self.lane_lock:
                            did = bool(eng.tick())
                    if not did:
                        self._lane_ticker_stop.wait(0.005)

            self.lane_ticker = threading.Thread(
                target=_tick_loop, name="lane-ticker", daemon=True)
            self.lane_ticker.start()

    def _on_breaker_state(self, s) -> None:
        """Breaker transitions: state gauge + open/close trip counters
        (ref: circuit_breaker_opens/closes_total, metrics.rs:102-116)."""
        prom = self.prometheus
        prom.circuit_state.set(s.value)
        if s.name == "OPEN":
            prom.breaker_opens.inc()
        elif s.name == "CLOSED":
            prom.breaker_closes.inc()

    def start_warmup_supervisor(self, idle_secs: float = 10.0) -> None:
        """Backpressured background bucket warmup.

        Without the lane engine this is plain
        ``pipeline.start_background_warmup()``. With it, bucket warmup
        only runs while NO stream is live: on axon the FIRST dispatch of
        a freshly compiled bucket program can occupy the chip for
        2-85 s, and the round-5 diagnostic loadtest showed background
        warmup dispatches serializing ahead of lane ticks (tick EWMA
        >1.2 s vs the 7.84 ms device cost), blowing partial budgets and
        tripping the breaker. Warmup is stopped (between buckets — an
        in-flight bucket still finishes) the moment a lane goes live and
        resumes after ``idle_secs`` of idle; ``is_warm`` bookkeeping
        makes stop/start resumable."""
        import threading
        import time as _time

        eng = self.lane_engine
        if eng is None:
            self.pipeline.start_background_warmup()
            return
        self._warmup_sup_stop = threading.Event()

        def run():
            pipe = self.pipeline
            idle_since = _time.monotonic()
            running = False
            while not self._warmup_sup_stop.is_set():
                if eng.live_lanes > 0:
                    idle_since = _time.monotonic()
                    if running:
                        pipe.stop_background_warmup()
                        running = False
                elif running:
                    t = pipe._warmup_thread
                    if t is not None and not t.is_alive():
                        return  # every bucket warm (or warmup bailed)
                elif _time.monotonic() - idle_since >= idle_secs:
                    pipe.start_background_warmup()
                    running = True
                self._warmup_sup_stop.wait(1.0)

        self._warmup_supervisor = threading.Thread(
            target=run, name="warmup-supervisor", daemon=True)
        self._warmup_supervisor.start()

    @property
    def lane_ticker_alive(self) -> bool:
        t = getattr(self, "lane_ticker", None)
        return t is not None and t.is_alive()

    def close(self) -> None:
        if getattr(self, "_warmup_sup_stop", None) is not None:
            self._warmup_sup_stop.set()
        if getattr(self, "_lane_ticker_stop", None) is not None:
            self._lane_ticker_stop.set()
            # join briefly: a daemon thread mid-dispatch at interpreter
            # exit aborts inside the XLA runtime (observed on the CPU
            # backend: "FATAL: exception not rethrown")
            self.lane_ticker.join(timeout=5.0)
        self.pipeline.stop_background_warmup()
        self.inference_executor.shutdown(wait=False, cancel_futures=True)
        self.session_executor.shutdown(wait=False, cancel_futures=True)
