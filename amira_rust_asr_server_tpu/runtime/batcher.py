"""Continuous batching: multiplex concurrent work onto shared device calls.

The reference's concurrency story is a gRPC connection pool + semaphores —
every request rides its own Triton round-trips (ref:
src/triton/pool_optimized.rs, src/async_patterns.rs BatchProcessor). The
TPU-native replacement is this collector: requests (batch POSTs and
streaming chunk decodes alike) queue up, a dispatcher packs whatever is
pending — up to the largest batch bucket, waiting at most
``batch_window_ms`` for stragglers — into ONE padded device invocation of
the compiled pipeline, then fans results back out to per-request futures.
Per-lane carried decoder state rides along, so streams and batch jobs mix
freely in the same device batch.

Length-aware packing: pending requests are grouped by audio-length bucket
before dispatch so one short chunk doesn't pad the whole batch to 30 s.
"""

from __future__ import annotations

import asyncio
import threading
import time
from collections import deque
from typing import List, Optional, Tuple

import numpy as np

from ..reliability import get_logger
from ..types import Transcription
from .pipeline import AsrPipeline, StreamState

log = get_logger("asr.batcher")


class BatcherStats:
    def __init__(self):
        self._lock = threading.Lock()
        self.dispatches = 0
        self.lanes_total = 0
        self.max_lanes_seen = 0

    def record(self, lanes: int) -> None:
        with self._lock:
            self.dispatches += 1
            self.lanes_total += lanes
            self.max_lanes_seen = max(self.max_lanes_seen, lanes)

    def to_json(self) -> dict:
        with self._lock:
            return {
                "dispatches": self.dispatches,
                "lanes_total": self.lanes_total,
                "mean_lanes": (self.lanes_total / self.dispatches
                               if self.dispatches else 0.0),
                "max_lanes": self.max_lanes_seen,
            }


class ContinuousBatcher:
    """Async collector in front of the compiled pipeline."""

    def __init__(self, pipeline: AsrPipeline, executor,
                 window_ms: Optional[float] = None,
                 max_lanes: Optional[int] = None):
        self.pipeline = pipeline
        self.executor = executor
        cfg = pipeline.config
        self.window_s = (window_ms if window_ms is not None
                         else cfg.batch_window_ms) / 1e3
        self.max_lanes = max_lanes or max(cfg.batch_buckets)
        self.stats = BatcherStats()
        # optional PrometheusMetrics (AppState wires it): batch_lanes
        # histogram per device dispatch
        self.prometheus = None
        from ..utils.async_patterns import ErrorRecoveryManager
        self._retry = ErrorRecoveryManager(
            max_retries=2, base_delay_s=0.05,
            retryable=(RuntimeError, TimeoutError))
        # bounded admission, one lane-class each for interactive batch
        # POSTs and streaming chunk re-decodes (ref: inference_queue_size,
        # config.rs:114-140): overflow rejects with 503 instead of
        # queueing unboundedly behind a slow device. Two classes + round-
        # robin packing means a flood of stream chunks can't starve batch
        # admission (or vice versa) — each dispatch interleaves both.
        self._maxsize = max(cfg.inference_queue_size, self.max_lanes)
        self._pending = {"batch": deque(), "stream": deque()}
        self._work = asyncio.Event()
        self._task: Optional[asyncio.Task] = None
        self._loop: Optional[asyncio.AbstractEventLoop] = None

    # ------------------------------------------------------------------
    async def start(self) -> None:
        """Idempotent: a second start() (e.g. app startup hook plus an
        explicit call in a test harness) must not spawn a duplicate
        dispatcher consuming the same queues."""
        if self._task is not None and not self._task.done():
            return
        self._loop = asyncio.get_running_loop()
        self._task = asyncio.create_task(self._run(), name="batcher")

    async def stop(self) -> None:
        if self._task:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None

    # ------------------------------------------------------------------
    async def submit(self, samples: np.ndarray,
                     stream_state: Optional[StreamState] = None,
                     kind: str = "batch"
                     ) -> Tuple[Transcription, StreamState]:
        """Queue one decode; resolves when its device batch completes.
        Raises CapacityExceededError when this lane-class's admission
        queue is full (the other class keeps its own budget — total
        pending work is therefore bounded by 2 x inference_queue_size,
        one budget per class; queue_depth() reports the sum)."""
        if kind not in self._pending:
            raise ValueError(
                f"unknown admission class {kind!r}; expected one of "
                f"{sorted(self._pending)}")
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        q = self._pending[kind]
        if len(q) >= self._maxsize:
            from ..errors import CapacityExceededError
            raise CapacityExceededError(
                f"{kind} inference queue is full")
        q.append((samples, stream_state, fut))
        self._work.set()
        return await fut

    def submit_from_thread(self, samples: np.ndarray,
                           stream_state: Optional[StreamState] = None,
                           timeout: Optional[float] = None
                           ) -> Tuple[Transcription, StreamState]:
        """Blocking submit for worker threads (e.g. the incremental
        streaming sessions running in the session executor); these are
        streaming chunk re-decodes, so they ride the "stream" class."""
        assert self._loop is not None, "batcher not started"
        cfut = asyncio.run_coroutine_threadsafe(
            self.submit(samples, stream_state, kind="stream"), self._loop)
        return cfut.result(timeout)

    # ------------------------------------------------------------------
    def _n_pending(self) -> int:
        return sum(len(q) for q in self._pending.values())

    def _take_fair(self) -> list:
        """Pop up to max_lanes pending items, round-robin across classes
        so neither batch POSTs nor stream chunks monopolize a dispatch."""
        out: list = []
        while len(out) < self.max_lanes:
            took = False
            for q in self._pending.values():
                if q and len(out) < self.max_lanes:
                    out.append(q.popleft())
                    took = True
            if not took:
                break
        return out

    async def _run(self) -> None:
        loop = asyncio.get_running_loop()
        while True:
            while not self._n_pending():
                self._work.clear()
                await self._work.wait()
            deadline = loop.time() + self.window_s
            while self._n_pending() < self.max_lanes:
                remaining = deadline - loop.time()
                if remaining <= 0:
                    break
                self._work.clear()
                try:
                    await asyncio.wait_for(self._work.wait(),
                                           timeout=remaining)
                except asyncio.TimeoutError:
                    break
            await self._dispatch(self._take_fair())

    # ------------------------------------------------------------------
    def _group_by_bucket(self, batch, mode: str = "greedy") -> List[list]:
        """Split pending work by audio-length bucket so short chunks don't
        get padded to the longest request's bucket — then cap each group at
        the largest already-compiled batch bucket for that length, so a
        burst budgeted for warm dispatch never lands in a cold bucket and
        stalls behind a minutes-long XLA compile (background warmup grows
        the cap over time). A fully-cold length bucket dispatches whole:
        everything in it pays the one compile regardless of packing."""
        groups: dict = {}
        for item in batch:
            bucket = self.pipeline._bucket_len(item[0].shape[0])
            groups.setdefault(bucket, []).append(item)
        out: List[list] = []
        for bucket, group in groups.items():
            cap = self.pipeline.warm_batch_cap(bucket, mode)
            natural = self.pipeline._bucket_batch(len(group))
            if cap == 0 or self.pipeline.is_warm(natural, bucket, mode):
                out.append(group)
                continue
            out.extend(group[i:i + cap] for i in range(0, len(group), cap))
        return out

    def queue_depth(self) -> int:
        """Pending admissions (prometheus asr_inference_queue_depth)."""
        return self._n_pending()

    def _record_dispatch(self, lanes: int) -> None:
        self.stats.record(lanes)
        if self.prometheus is not None:
            self.prometheus.batch_lanes.observe(lanes)

    def _observe_device(self, program: str, duration_s: float,
                        ok: bool) -> None:
        """Per-XLA-dispatch telemetry (the reference's triton_inference_*
        series, metrics.rs:74-90)."""
        if self.prometheus is not None:
            self.prometheus.observe_dispatch(program, duration_s, ok)

    async def _dispatch(self, batch) -> None:
        if self.pipeline.config.decoding_mode == "beam":
            await self._dispatch_beam(batch)
            return
        loop = asyncio.get_running_loop()
        try:
            groups = self._group_by_bucket(batch)
        except Exception as e:  # noqa: BLE001 — malformed submission
            for *_, fut in batch:
                if not fut.done():
                    fut.set_exception(e)
            return
        for group in groups:
            samples = [item[0] for item in group]
            states = [item[1] for item in group]
            futures = [item[2] for item in group]
            # time INSIDE the executor callable, per attempt: the metric
            # is device-dispatch latency, not single-dispatch-thread
            # queueing or retry backoff (those would conflate under load).
            # None = the callable never ran (executor/retry-wrapper failure
            # before dispatch) — no sample belongs in the histogram then.
            dev_s = [None]

            def call_greedy():
                ta = time.perf_counter()
                try:
                    return self.pipeline.decode_samples_batch(samples,
                                                              states)
                finally:
                    dev_s[0] = time.perf_counter() - ta

            try:
                # transient device/runtime errors retry with backoff
                # (ref: ErrorRecoveryManager, async_patterns.rs:152-192)
                res, feat_lens, enc_lens, new_states = \
                    await self._retry.run(lambda: loop.run_in_executor(
                        self.executor, call_greedy))
            except Exception as e:  # noqa: BLE001 — fan the error out
                if dev_s[0] is not None:
                    self._observe_device("greedy", dev_s[0], ok=False)
                for fut in futures:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            self._observe_device("greedy", dev_s[0], ok=True)
            self._record_dispatch(len(group))
            for i, fut in enumerate(futures):
                if fut.done():
                    continue
                tr = self.pipeline._to_transcription(
                    res, i, samples[i].shape[0],
                    int(feat_lens[i]), int(enc_lens[i]))
                fut.set_result((tr, new_states[i]))

    async def _dispatch_beam(self, batch) -> None:
        """Beam-mode dispatch: requests share the (batch x beam)-lane beam
        program. Carried stream state isn't supported in beam mode (beam
        serves the batch endpoint; streams decode greedily)."""
        from ..types import Transcription
        loop = asyncio.get_running_loop()
        try:
            groups = self._group_by_bucket(batch, mode="beam")
        except Exception as e:  # noqa: BLE001
            for *_, fut in batch:
                if not fut.done():
                    fut.set_exception(e)
            return
        cfg = self.pipeline.config
        for group in groups:
            samples = [item[0] for item in group]
            futures = [item[2] for item in group]
            dev_s = [None]  # per-attempt device timing (see greedy path)

            def call_beam():
                ta = time.perf_counter()
                try:
                    return self.pipeline.decode_beam_batch(
                        samples, n_best=cfg.beam_n_best)
                finally:
                    dev_s[0] = time.perf_counter() - ta

            try:
                res, feat_lens, enc_lens = await self._retry.run(
                    lambda: loop.run_in_executor(self.executor, call_beam))
            except Exception as e:  # noqa: BLE001
                if dev_s[0] is not None:
                    self._observe_device("beam", dev_s[0], ok=False)
                for fut in futures:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            self._observe_device("beam", dev_s[0], ok=True)
            self._record_dispatch(len(group))
            vocab = self.pipeline.vocab
            for i, fut in enumerate(futures):
                if fut.done():
                    continue
                toks = [int(t) for t in res.tokens[i, :int(res.counts[i])]]
                tr = Transcription(
                    text=vocab.decode_tokens(toks), tokens=toks,
                    audio_length_samples=samples[i].shape[0],
                    features_length=feat_lens[i],
                    encoded_length=enc_lens[i],
                    decode_path=self.pipeline.last_decode_path)
                if res.n_best:
                    tr.n_best = [
                        {"text": vocab.decode_tokens(seq), "score": score,
                         "tokens": seq} for score, seq in res.n_best[i]]
                fut.set_result((tr, None))
