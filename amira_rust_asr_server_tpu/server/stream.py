"""WebSocket streaming session processor.

Protocol parity with the reference's StreamProcessor
(ref: src/server/stream.rs:54-518):
- binary frames carry 16-bit PCM; 1-byte frames are control bytes
  (END=0xFF, KEEPALIVE=0x00 — the values the reference *code* uses,
  constants.rs:243-246)
- per-frame 1MB cap, 100 msg/s sliding-window rate limit
- partials once >= 0.1 s of audio is buffered (ACTIVE), keepalive ticks
  every 100 ms, 30 s inactivity timeout, 5 s inference timeout
- ACTIVE partial metadata: {audio_length_seconds, processing_time_ms};
  final response is COMPLETE.

Deviation (documented): on the END control byte the reference surfaces an
Error-status frame before the final COMPLETE (stream.rs:236-244 routes END
through the error path); here END cleanly finalizes with COMPLETE only.
"""

from __future__ import annotations

import asyncio
import time
import uuid
from typing import Optional

import numpy as np

from aiohttp import WSMsgType, web

from .. import constants as C
from ..errors import CapacityExceededError, CircuitOpenError
from ..reliability import get_logger
from ..runtime.incremental import IncrementalAsr
from ..types import AsrResponse, StreamStatus
from .state import AppState

log = get_logger("asr.stream")


class RateLimiter:
    """Sliding-window message rate limit (ref: stream.rs:447-484)."""

    def __init__(self, max_messages: int = C.MAX_MESSAGES_PER_WINDOW,
                 window_secs: float = C.RATE_LIMIT_WINDOW_SECS):
        self.max_messages = max_messages
        self.window_secs = window_secs
        self._count = 0
        self._window_start = time.monotonic()

    def check(self) -> bool:
        now = time.monotonic()
        if now - self._window_start >= self.window_secs:
            self._window_start = now
            self._count = 0
        self._count += 1
        return self._count <= self.max_messages


class _LaneAdapter:
    """Bridges one WS session onto the shared StreamingLaneEngine.

    Falls back to a dedicated NativeStreamSession when all lanes are busy
    (admission control at the stream semaphore usually prevents this).
    Engine access is serialized by state.lane_lock; a tick processes ALL
    ready lanes, so concurrent streams batch naturally.
    """

    def __init__(self, state: AppState):
        from ..runtime.native_stream import NativeStreamSession

        self.state = state
        self.engine = state.lane_engine
        self.lock = state.lane_lock
        self._samples = 0
        self.session = None
        # Per-session feed ordering: a timed-out partial's work item may
        # still be running when the next chunk's work starts on another
        # pool thread; this lock keeps one session's feeds sequential so
        # audio cannot interleave out of order on the lane.
        import threading
        self._feed_lock = threading.Lock()
        with self.lock:
            self.lane = self.engine.attach()
        if self.lane is None:
            cfg = state.config
            self.session = NativeStreamSession(
                state.pipeline.model, state.pipeline.params,
                state.pipeline.vocab,
                chunk_frames=cfg.native_chunk_frames,
                norm=cfg.native_norm,
                max_symbols=cfg.max_symbols_per_step,
                max_total=cfg.max_total_tokens)

    def _feed(self, samples, final: bool) -> str:
        if self.session is not None:
            if final:
                return self.session.end().text
            return self.session.feed(samples)
        with self._feed_lock:
            return self._feed_lane(samples, final)

    def _feed_lane(self, samples, final: bool) -> str:
        import time as _time

        ticker = self.state.lane_ticker_alive
        with self.lock:
            self.engine.feed(self.lane, samples, final=final)
            if not ticker:
                # no background ticker (direct construction in tests):
                # original inline behavior
                if final:
                    return self.engine.drain(self.lane)
                self.engine.tick()
                return self.engine.transcript(self.lane)
        if final:
            # the ticker drains the lane; wait for the backlog to empty,
            # bounded, then fall back to an inline drain
            deadline = (_time.monotonic()
                        + self.state.config.inference_timeout_secs)
            while _time.monotonic() < deadline:
                with self.lock:
                    if not self.engine.lane_ready(self.lane):
                        return self.engine.transcript(self.lane)
                _time.sleep(0.005)
            with self.lock:
                return self.engine.drain(self.lane)
        # partials never dispatch: the transcript reflects whatever the
        # ticker has decoded so far (append-only, may lag by one chunk)
        with self.lock:
            return self.engine.transcript(self.lane)

    def process_chunk(self, audio_bytes: bytes) -> str:
        from ..audio import pcm16_bytes_to_f32
        samples = pcm16_bytes_to_f32(audio_bytes)
        self._samples += samples.shape[0]
        return self._feed(samples, final=False)

    def finalize(self) -> str:
        text = self._feed(np.zeros(0, np.float32), final=True)
        if self.lane is not None:
            with self.lock:
                self.engine.detach(self.lane)
            self.lane = None
        return text

    def audio_length(self) -> float:
        from ..constants import SAMPLE_RATE
        return self._samples / SAMPLE_RATE

    def release(self) -> None:
        """Cleanup for streams that end without a final drain."""
        if self.lane is not None:
            with self.lock:
                self.engine.detach(self.lane)
            self.lane = None


class _BeamStreamAdapter:
    """One WS session on a dedicated StreamingBeamSession (beam mode).

    Streaming beam carries K hypotheses across chunks (parity-plus: the
    reference's k2 beam is batch-only, k2_decoder_backend.cc:63-253).
    Sessions are per-stream rather than lane-batched: beam state is K×
    the greedy carry and the expected traffic mix is greedy-dominated.
    Partials report the current BEST hypothesis — unlike greedy-native
    partials they may retract when the beam leader changes (clients
    receive the full transcript each time, so retraction is
    representable in the wire protocol).
    """

    def __init__(self, state: AppState):
        from ..runtime.beam_stream import StreamingBeamSession

        self.state = state
        cfg = state.config
        self._samples = 0
        self.session = StreamingBeamSession(
            state.pipeline.model, state.pipeline.params,
            state.pipeline.vocab,
            chunk_frames=cfg.native_chunk_frames,
            norm=cfg.native_norm,
            beam_width=cfg.beam_width,
            graph=state.pipeline.beam_graph)

    def process_chunk(self, audio_bytes: bytes) -> str:
        from ..audio import pcm16_bytes_to_f32
        samples = pcm16_bytes_to_f32(audio_bytes)
        self._samples += samples.shape[0]
        return self.session.feed(samples)

    def finalize(self) -> str:
        return self.session.end().text

    def audio_length(self) -> float:
        from ..constants import SAMPLE_RATE
        return self._samples / SAMPLE_RATE

    def release(self) -> None:
        pass  # per-stream session: garbage-collected with the processor


class StreamProcessor:
    def __init__(self, ws: web.WebSocketResponse, state: AppState,
                 stream_id: Optional[str] = None):
        self.ws = ws
        self.state = state
        self.stream_id = stream_id or uuid.uuid4().hex
        cfg = state.config
        if (cfg.decoding_mode == "beam" and cfg.streaming_mode == "native"
                and state.pipeline.model.config.causal):
            # streaming beam: carried hypotheses across chunks
            self.incremental = _BeamStreamAdapter(state)
        elif (cfg.streaming_mode == "native"
                and state.pipeline.model.config.causal):
            # native mode: all streams share the lane engine — one fused
            # chunk-step program advances every ready lane per tick, and
            # whichever session thread ticks first carries its peers' work
            self.incremental = _LaneAdapter(state)
        else:
            # parity mode: window decodes go through the continuous batcher
            # so concurrent streams share device batches (the session
            # thread blocks on the submit while the dispatcher packs lanes)
            self.incremental = IncrementalAsr(
                state.pipeline, cfg.chunk_size_seconds,
                cfg.leading_context_seconds, cfg.trailing_context_seconds,
                cfg.buffer_capacity_seconds,
                decode_fn=state.batcher.submit_from_thread)
        self.pending = bytearray()  # audio awaiting the partial threshold
        self.last_transcription = ""
        self.is_paused = False
        self.rate_limiter = RateLimiter()
        self.closed = False

    # ------------------------------------------------------------------
    async def process(self) -> None:
        """Main event loop: multiplex WS frames, keepalive ticks, shutdown."""
        cfg = self.state.config
        last_activity = time.monotonic()
        keepalive_period = cfg.keepalive_check_period_ms / 1000.0
        ended = False

        while not self.closed:
            if self.state.shutdown.is_shutting_down:
                log.info("stream %s: server shutdown", self.stream_id)
                break
            try:
                msg = await self.ws.receive(timeout=keepalive_period)
            except asyncio.TimeoutError:
                # keepalive tick (ref: stream.rs:174-194)
                if (time.monotonic() - last_activity
                        > cfg.stream_timeout_secs):
                    await self.send_error("Stream timeout")
                    break
                if self.is_paused:
                    await self.send_response(AsrResponse(
                        transcription=self.last_transcription,
                        status=StreamStatus.PAUSED))
                continue

            if msg.type == WSMsgType.BINARY:
                last_activity = time.monotonic()
                try:
                    ended = await self.handle_audio_chunk(msg.data)
                except Exception as e:  # noqa: BLE001 — error frame + close
                    log.error("stream %s chunk error: %s",
                              self.stream_id, e)
                    self.state.metrics.record_error()
                    await self.send_error(str(e))
                    break
                if ended:
                    break
            elif msg.type in (WSMsgType.CLOSE, WSMsgType.CLOSING,
                              WSMsgType.CLOSED, WSMsgType.ERROR):
                break
            # text/ping/pong frames ignored (parity: stream.rs:169-171)

        # END wire parity (opt-in): the reference routes END through its
        # error path, surfacing an Error-status frame before the COMPLETE
        # (stream.rs:236-244; exact message per error.rs:144,208)
        if ended and cfg.end_error_frame_parity:
            await self.send_error(
                "Server error: Request validation error: End of stream")

        # final drain (ref: stream.rs:203-207)
        if self.pending or ended or self.last_transcription:
            try:
                await self.process_buffered(is_final=True)
            except Exception as e:  # noqa: BLE001
                log.error("stream %s final drain failed: %s",
                          self.stream_id, e)
        if hasattr(self.incremental, "release"):
            self.incremental.release()  # free the engine lane

    # ------------------------------------------------------------------
    async def handle_audio_chunk(self, data: bytes) -> bool:
        """Returns True when the END control byte arrived."""
        self.is_paused = False
        if self.state.prometheus:
            self.state.prometheus.websocket_messages.labels(
                direction="in").inc()
            self.state.prometheus.audio_chunk_bytes.observe(len(data))

        if len(data) > C.MAX_WS_CHUNK_BYTES:
            raise ValueError(
                f"Audio chunk too large: {len(data)} bytes "
                f"(max: {C.MAX_WS_CHUNK_BYTES})")
        if not self.rate_limiter.check():
            raise ValueError("Rate limit exceeded")

        if len(data) == 1:
            control = data[0]
            if control == C.CONTROL_BYTE_END:
                return True
            if control == C.CONTROL_BYTE_KEEPALIVE:
                self.is_paused = True
                return False
            raise ValueError("Unknown control byte")

        if len(data) % 2 != 0:
            raise ValueError(
                "Audio data length must be even for 16-bit PCM")

        self.pending += data
        if len(self.pending) >= C.MIN_PARTIAL_TRANSCRIPTION_SAMPLES * 2:
            await self.process_buffered(is_final=False)
        return False

    # ------------------------------------------------------------------
    async def process_buffered(self, is_final: bool) -> None:
        chunk = bytes(self.pending)
        self.pending.clear()
        t0 = time.perf_counter()

        if chunk or (is_final and hasattr(self.incremental, "finalize")):
            loop = asyncio.get_running_loop()
            if is_final and hasattr(self.incremental, "finalize"):
                def work():
                    if chunk:
                        self.incremental.process_chunk(chunk)
                    return self.incremental.finalize()
            else:
                def work():
                    return self.incremental.process_chunk(chunk)
            # cold-aware budget: in native mode the hot program is the
            # LANE ENGINE's fused chunk step, not the pipeline's batch
            # buckets — key the budget on the warmth of the program this
            # stream actually dispatches (the single-session fallback
            # compiles its own programs, so it is always "cold")
            if getattr(self.incremental, "session", None) is not None:
                warmed = False
            elif getattr(self.incremental, "engine", None) is not None:
                warmed = self.incremental.engine.warmed_up
            else:
                warmed = self.state.pipeline.warmed_up
            budget = (self.state.config.inference_timeout_secs if warmed
                      else self.state.config.cold_bucket_timeout_secs)
            try:
                transcription = await self._decode_with_retry(
                    loop, work, budget, is_final)
            except (asyncio.TimeoutError, CircuitOpenError) as e:
                if is_final:
                    if isinstance(e, CircuitOpenError):
                        raise
                    raise ValueError("ASR processing timeout") from None
                # a slow PARTIAL must not kill the stream (round-5 native
                # loadtest: timeout -> error frame -> close -> reconnect
                # storm). Same for a breaker-open episode: the diagnostic
                # re-run showed the breaker (tripped by early slow-tick
                # timeouts) closing EVERY stream for its full open window
                # ("chunk error: inference circuit is open" x293). The
                # audio is already in the session/lane buffer; the next
                # window or the final drain re-decodes it. Only the final
                # drain — where the client cannot re-send — is allowed to
                # error the stream.
                self.state.metrics.record_rejection()
                log.info("stream %s: partial deferred (slow decode)",
                         self.stream_id)
                await self.send_response(AsrResponse(
                    transcription=self.last_transcription,
                    status=StreamStatus.ACTIVE,
                    message="busy: partial deferred",
                    metadata={"audio_length_seconds":
                              self.incremental.audio_length()}))
                return
            except CapacityExceededError:
                # transient load shed: the admission queue was full for
                # this window's re-decode. The audio is already in the
                # session buffer, so the next chunk (or the final drain)
                # re-decodes it — shed ONE partial, never the stream
                # (batch POSTs retry a 503; a live stream cannot).
                if is_final:
                    # the final drain already retried once with backoff
                    # (_decode_with_retry); the audio cannot be re-sent by
                    # the client, so only a persistently full queue errors
                    raise
                self.state.metrics.record_rejection()
                log.info("stream %s: partial deferred (device busy)",
                         self.stream_id)
                await self.send_response(AsrResponse(
                    transcription=self.last_transcription,
                    status=StreamStatus.ACTIVE,
                    message="busy: partial deferred",
                    metadata={"audio_length_seconds":
                              self.incremental.audio_length()}))
                return
            self.last_transcription = transcription

        await self.send_response(AsrResponse(
            transcription=self.last_transcription,
            status=(StreamStatus.COMPLETE if is_final
                    else StreamStatus.ACTIVE),
            metadata={
                "audio_length_seconds": self.incremental.audio_length(),
                "processing_time_ms": round(
                    (time.perf_counter() - t0) * 1e3),
            }))

    # ------------------------------------------------------------------
    async def _decode_with_retry(self, loop, work, budget: float,
                                 is_final: bool):
        """Run the window decode; the FINAL drain retries once after a
        short backoff on a capacity shed. A queue-full at exactly the
        final chunk is the one case the client cannot recover from (the
        audio was already streamed), so it gets one second chance before
        the stream errors; interim partials shed immediately (the next
        window re-decodes the same buffered audio anyway)."""
        attempts = 2 if is_final else 1
        for attempt in range(attempts):
            fut = loop.run_in_executor(self.state.session_executor, work)
            try:
                return await self.state.breaker.call_async(
                    self._await_with_heartbeat(fut, budget))
            except CapacityExceededError:
                if attempt + 1 >= attempts:
                    raise
                log.info("stream %s: final drain shed, retrying once",
                         self.stream_id)
                await asyncio.sleep(0.25)

    async def _await_with_heartbeat(self, fut, budget: float):
        """Await the decode, emitting an ACTIVE heartbeat frame (last
        transcript, message="processing") every keepalive period while a
        slow dispatch runs — a cold-compile spike must not starve the
        client's receive loop into abandoning the session (round-3 native
        loadtest: receive timeouts -> reconnect storm). Warm decodes
        finish within one period and never heartbeat."""
        period = max(self.state.config.keepalive_check_period_ms / 1000.0,
                     0.05)
        deadline = time.monotonic() + budget
        task = asyncio.ensure_future(fut)
        while True:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                task.cancel()
                raise asyncio.TimeoutError
            try:
                return await asyncio.wait_for(
                    asyncio.shield(task), min(period, remaining))
            except asyncio.TimeoutError:
                if time.monotonic() - deadline >= 0:
                    task.cancel()
                    raise
                await self.send_response(AsrResponse(
                    transcription=self.last_transcription,
                    status=StreamStatus.ACTIVE,
                    message="processing"))

    # ------------------------------------------------------------------
    async def send_response(self, response: AsrResponse) -> None:
        if self.ws.closed:
            self.closed = True
            return
        try:
            await self.ws.send_json(response.to_json())
            if self.state.prometheus:
                self.state.prometheus.websocket_messages.labels(
                    direction="out").inc()
        except ConnectionError:
            self.closed = True

    async def send_error(self, message: str) -> None:
        await self.send_response(AsrResponse(
            transcription="", status=StreamStatus.ERROR, message=message))
