"""HTTP/WebSocket front-end.

Route and behavior parity with the reference's axum router
(ref: src/server/handlers.rs:246-255):

    GET  /v2/decode/stream/{model}   WebSocket streaming
    POST /v2/decode/batch/{model}    batch transcription
    GET  /health                     health check
    GET  /metrics                    JSON metrics (or prometheus)
    POST /admin/reset-batch-count    zombie-request reset

plus the in-process model-repository surface (the reference deploys
behind Triton's repository API; here it's native):

    GET|POST /v2/repository/index                repository listing
    POST     /v2/repository/models/{name}/load   hot checkpoint reload

Request validation (handlers.rs:66-118): non-empty even-length audio,
100MB byte cap, 30 s duration cap, 10KB opaque cap. Admission control via
non-blocking semaphores (503 on exhaustion). CORS is permissive.
"""

from __future__ import annotations

import asyncio
import base64
import json
from typing import Any, Optional

from aiohttp import web

from .. import constants as C
from ..config import Config
from ..errors import AppError, CapacityExceededError, RequestValidationError
from ..models import Transducer
from ..reliability import get_logger, init_tracing, request_span
from ..runtime import AsrPipeline
from ..types import AsrResponse, StreamStatus
from ..vocab import Vocabulary
from .state import AppState
from .stream import StreamProcessor

log = get_logger("asr.server")


# ---------------------------------------------------------------------------
# request parsing / validation
# ---------------------------------------------------------------------------
def parse_batch_request(body: dict,
                        max_secs: float = C.MAX_BATCH_AUDIO_LENGTH_SECS
                        ) -> tuple[bytes, Any]:
    """Extract (audio_bytes, opaque) from a batch request body.

    ``audio_buffer`` accepts a JSON array of u8 (the reference's wire form,
    serde Vec<u8>) or a base64 string (extension for sane payload sizes).
    """
    if "audio_buffer" not in body:
        raise RequestValidationError("audio_buffer is required")
    raw = body["audio_buffer"]
    if isinstance(raw, str):
        try:
            audio = base64.b64decode(raw, validate=True)
        except Exception:
            raise RequestValidationError(
                "audio_buffer string must be base64") from None
    elif isinstance(raw, list):
        try:
            audio = bytes(raw)
        except (ValueError, TypeError):
            raise RequestValidationError(
                "audio_buffer must contain bytes 0-255") from None
    else:
        raise RequestValidationError("audio_buffer must be array or base64")

    if len(audio) == 0:
        raise RequestValidationError("Audio buffer cannot be empty")
    if len(audio) % 2 != 0:
        raise RequestValidationError(
            "Audio buffer length must be even for 16-bit PCM")
    if len(audio) > C.MAX_AUDIO_BYTES:
        raise RequestValidationError(
            f"Audio buffer too large: {len(audio)} bytes "
            f"(max: {C.MAX_AUDIO_BYTES} bytes)")
    secs = len(audio) / (C.SAMPLE_RATE * 2.0)
    if secs > max_secs:
        raise RequestValidationError(
            f"Audio too long: {secs:.1f}s (max: {max_secs:.0f}s)")

    opaque = body.get("opaque")
    if opaque is not None:
        if len(json.dumps(opaque)) > C.MAX_OPAQUE_BYTES:
            raise RequestValidationError("Opaque data too large (max: 10KB)")
    return audio, opaque


def _lattice_transcription(state: "AppState", res, n_samples: int,
                           feat_len: int, enc_len: int):
    """Transcription for a lattice-bypass beam decode (mirrors
    AsrPipeline.process_batch_samples' beam branch)."""
    from ..types import Transcription
    tokens = [int(t) for t in res.tokens[0, :int(res.counts[0])]]
    tr = Transcription(
        text=state.vocab.decode_tokens(tokens), tokens=tokens,
        audio_length_samples=n_samples, features_length=feat_len,
        encoded_length=enc_len, score=float(res.scores[0]),
        decode_path=state.pipeline.last_decode_path)
    if res.n_best:
        tr.n_best = [
            {"text": state.vocab.decode_tokens(seq), "score": score,
             "tokens": seq}
            for score, seq in res.n_best[0]]
    return tr


def error_response(err: Exception) -> web.Response:
    if isinstance(err, AppError):
        return web.json_response(err.to_json(), status=err.http_status)
    return web.json_response(
        {"error": "internal_error", "message": str(err)}, status=500)


# ---------------------------------------------------------------------------
# handlers
# ---------------------------------------------------------------------------
async def handle_batch(request: web.Request) -> web.Response:
    state: AppState = request.app["state"]
    if state.shutdown.is_shutting_down:
        return web.json_response(
            {"error": "shutting_down", "message": "server is draining"},
            status=503)
    if not state.batch_semaphore.try_acquire():
        state.metrics.record_rejection()
        return error_response(CapacityExceededError(
            "Too many concurrent batch requests"))
    state.metrics.increment_batch()
    import time
    t0 = time.perf_counter()
    try:
        try:
            body = await request.json()
        except Exception:
            raise RequestValidationError("invalid JSON body") from None
        audio, opaque = parse_batch_request(
            body, state.config.max_batch_audio_length_secs)
        want_lattice = bool(body.get("lattice", False))
        if want_lattice and state.config.decoding_mode != "beam":
            raise RequestValidationError(
                "lattice output requires decoding_mode=beam")
        if want_lattice and state.config.model_family != "transducer":
            # lattices are assembled from the transducer beam's device
            # trace (ops/lattice.py); the CTC/AED beam surfaces expose
            # n_best instead
            raise RequestValidationError(
                "lattice output requires the transducer model family")
        lattice_n_best = body.get("n_best", state.config.beam_width)
        if want_lattice:
            try:
                lattice_n_best = max(1, int(lattice_n_best))
            except (TypeError, ValueError):
                raise RequestValidationError(
                    "n_best must be an integer") from None

        with request_span("batch", model=request.match_info.get("model")):
            # budget: cold buckets include an XLA compile (~1 min under
            # remote compile) — don't 504 them at the serving timeout
            warm = state.pipeline.is_warm(1, len(audio) // 2)
            budget = (state.config.inference_timeout_secs * 6 if warm
                      else state.config.cold_bucket_timeout_secs)
            async with state.shutdown.guard():
                # greedy AND beam requests ride the continuous batcher
                # (the batcher dispatches per the configured decoding mode)
                from ..audio import pcm16_bytes_to_f32
                tc = time.perf_counter()
                samples = pcm16_bytes_to_f32(audio)
                if state.prometheus:
                    state.prometheus.audio_conversion.observe(
                        time.perf_counter() - tc)
                    state.prometheus.audio_chunk_bytes.observe(len(audio))
                if want_lattice:
                    # lattice requests bypass the continuous batcher (they
                    # need the device trace, which the batcher's result
                    # surface rightly does not carry) but still ride the
                    # single dispatch thread + breaker + timeout budget;
                    # the jitted program is the SAME _beam_fwd the batcher
                    # warms, so this compiles nothing new
                    from ..ops.lattice import decode_beam_lattice
                    loop = asyncio.get_running_loop()
                    res, lattices, feat_lens, enc_lens = (
                        await state.breaker.call_async(asyncio.wait_for(
                            loop.run_in_executor(
                                state.inference_executor,
                                lambda: decode_beam_lattice(
                                    state.pipeline, [samples],
                                    n_best=lattice_n_best)),
                            budget)))
                    tr = _lattice_transcription(
                        state, res, samples.shape[0],
                        feat_lens[0], enc_lens[0])
                else:
                    tr, _ = await state.breaker.call_async(
                        asyncio.wait_for(
                            state.batcher.submit(samples), budget))

        metadata = {
            "audio_length_samples": tr.audio_length_samples,
            "features_length": tr.features_length,
            "encoded_length": tr.encoded_length,
            "tokens": tr.tokens,
        }
        if tr.token_details:
            metadata["token_details"] = [
                {"id": d.id, "time_s": d.time_s,
                 "confidence": d.confidence} for d in tr.token_details]
            metadata["words"] = state.vocab.decode_words(tr.token_details)
        if tr.n_best:
            metadata["n_best"] = tr.n_best
        if tr.decode_path:
            # kernel-vs-scan routing (a >1024-state grammar silently
            # falls back to the slower XLA scan — make it diagnosable)
            metadata["decode_path"] = tr.decode_path
        if want_lattice:
            sec_per_frame = (
                C.HOP_LENGTH
                * state.pipeline.model.config.subsampling_factor
                / C.SAMPLE_RATE)
            metadata["lattice"] = lattices[0].to_dict(
                vocab=state.vocab, sec_per_frame=sec_per_frame)
        response = AsrResponse(
            transcription=tr.text, status=StreamStatus.COMPLETE,
            metadata=metadata, opaque=opaque)
        if state.prometheus:
            state.prometheus.observe_request(
                "batch", "ok", time.perf_counter() - t0,
                len(audio) / (2 * C.SAMPLE_RATE))
        return web.json_response(response.to_json())
    except asyncio.TimeoutError:
        state.metrics.record_error()
        if state.prometheus:
            state.prometheus.observe_request("batch", "error",
                                             error="timeout")
        return web.json_response(
            {"error": "inference_timeout", "message": "inference timed out"},
            status=504)
    except Exception as e:  # noqa: BLE001
        if not isinstance(e, AppError):
            log.exception("batch handler error")
        state.metrics.record_error()
        if state.prometheus:
            from ..errors import CircuitOpenError
            if isinstance(e, CircuitOpenError):
                state.prometheus.breaker_rejections.inc()
            state.prometheus.observe_request(
                "batch", "error", error=type(e).__name__)
        return error_response(e)
    finally:
        state.metrics.decrement_batch()
        state.batch_semaphore.release()


async def handle_stream(request: web.Request) -> web.StreamResponse:
    state: AppState = request.app["state"]
    if state.config.model_family != "transducer":
        # the WS contract is carried decoder state across chunks; CTC and
        # AED are stateless per utterance (runtime/family_pipeline.py), so
        # streaming them would silently re-decode full context per chunk
        return web.json_response(
            {"error": "unsupported_model_family",
             "message": f"streaming requires the transducer family; "
                        f"model_family={state.config.model_family} serves "
                        f"the batch endpoint only"},
            status=400)
    if state.config.decoding_mode == "beam" and not (
            state.config.streaming_mode == "native"
            and state.pipeline.model.config.causal):
        # streaming beam needs carried hypotheses, which exist only in the
        # native (causal cached-encoder) mode — the parity chunk+re-decode
        # mode cannot carry a beam; reject loudly instead of silently
        # decoding each chunk fresh
        return web.json_response(
            {"error": "unsupported_decoding_mode",
             "message": "beam streaming requires streaming_mode=native "
                        "with a causal model; batch endpoint serves beam "
                        "for non-native configurations"},
            status=400)
    ws = web.WebSocketResponse(heartbeat=None, max_msg_size=2 * C.MAX_WS_CHUNK_BYTES)
    await ws.prepare(request)

    if not state.stream_semaphore.try_acquire():
        state.metrics.record_rejection()
        log.error("rejected stream: too many concurrent streams")
        await ws.close(code=1013, message=b"too many concurrent streams")
        return ws

    # construct BEFORE touching gauges: an exception here must not leave
    # ws_active permanently incremented (every inc below is paired with
    # the finally dec)
    try:
        processor = StreamProcessor(ws, state)
    except BaseException:
        state.stream_semaphore.release()
        raise
    stream_id = processor.stream_id
    state.metrics.increment_stream()
    if state.prometheus:
        state.prometheus.ws_connections.inc()
        state.prometheus.ws_active.inc()
    state.active_streams[stream_id] = processor
    log.info("stream %s started (model=%s)", stream_id,
             request.match_info.get("model"))
    try:
        async with state.shutdown.guard():
            await processor.process()
    finally:
        # RAII-style cleanup (ref: StreamCleanupGuard, handlers.rs:26-41)
        state.active_streams.pop(stream_id, None)
        state.metrics.decrement_stream()
        if state.prometheus:
            state.prometheus.ws_active.dec()
        state.stream_semaphore.release()
        if not ws.closed:
            await ws.close()
        log.info("stream %s ended", stream_id)
    return ws


async def health_check(request: web.Request) -> web.Response:
    state: AppState = request.app["state"]
    payload = {
        "status": "healthy",
        "service": "amira-asr-tpu-server",
        "version": "1.0.0",
    }
    if request.query.get("deep"):
        # device-liveness probe: a tiny op must complete within 2 s
        # (failure-detection for the device loop; the reference's breaker
        # watches Triton instead — SURVEY §5 failure detection)
        import jax
        import jax.numpy as jnp

        def probe():
            return float(jnp.sum(jnp.ones((8, 128))))

        loop = asyncio.get_running_loop()
        try:
            value = await asyncio.wait_for(
                loop.run_in_executor(state.inference_executor, probe), 2.0)
            payload["device"] = {
                "platform": jax.devices()[0].platform,
                "probe": value == 1024.0,
            }
        except Exception as e:  # noqa: BLE001
            payload["status"] = "degraded"
            payload["device"] = {"error": str(e)[:200]}
            payload["circuit_breaker"] = state.breaker.stats()
            return web.json_response(payload, status=503)
    return web.json_response(payload)


async def metrics_handler(request: web.Request) -> web.Response:
    state: AppState = request.app["state"]
    if state.prometheus:
        return web.Response(body=state.prometheus.exposition(),
                            content_type="text/plain")
    payload = state.metrics.to_json()
    payload["circuit_breaker"] = state.breaker.stats()
    payload["batcher"] = state.batcher.stats.to_json()
    if state.lane_engine is not None:
        eng = state.lane_engine
        payload["lane_engine"] = eng.stats.to_json(
            eng.live_lanes, eng.n_lanes, eng.warmed_up)
    if state.config.decoding_mode == "beam":
        payload["beam_decode_paths"] = dict(
            state.pipeline.decode_path_counts)
    return web.json_response(payload)


async def get_config(request: web.Request) -> web.Response:
    """Effective configuration introspection (the runtime counterpart of
    the reference's config TOML/YAML export, ref: config.rs:659-668)."""
    import dataclasses
    state: AppState = request.app["state"]
    cfg = dataclasses.asdict(state.config)
    cfg["model_config"] = dataclasses.asdict(state.pipeline.model.config)
    return web.json_response(cfg)


async def repository_index_handler(request: web.Request) -> web.Response:
    """Model-repository listing — the in-process analogue of Triton's
    ``POST /v2/repository/index`` (the reference's deploy target manages
    models through Triton's repository API; ref: constants.rs:291-292
    DEFAULT_MODEL_REPO). Served on GET too for curl ergonomics."""
    state: AppState = request.app["state"]
    from ..runtime.reload import repository_index
    rows = repository_index(state.config.model_repo_path,
                            state.loaded_model)
    return web.json_response({
        "models": rows,
        "loaded": state.loaded_model,
        "model_repository": state.config.model_repo_path,
    })


async def repository_load(request: web.Request) -> web.Response:
    """Hot checkpoint reload — Triton's ``/v2/repository/models/{name}/
    load`` semantics, in-process: swap serving weights without a restart
    or a recompile (params are jit arguments). 404 unknown model, 409
    while native streams are live, 422 on an architecture mismatch; the
    old weights keep serving on any failure (runtime/reload.py)."""
    state: AppState = request.app["state"]
    if state.shutdown.is_shutting_down:
        return web.json_response(
            {"error": "shutting_down", "message": "server is draining"},
            status=503)
    name = request.match_info["name"]
    # ?validate=1: canary smoke decode on the new weights with automatic
    # rollback on failure (parity-plus: Triton has no equivalent)
    validate = request.query.get("validate", "") in ("1", "true", "yes")
    from ..runtime.reload import hot_swap
    loop = asyncio.get_event_loop()
    try:
        # session executor: orbax restore + device transforms take
        # seconds — never on the event loop
        info = await loop.run_in_executor(
            state.session_executor, hot_swap, state, name, validate)
    except Exception as e:
        if not isinstance(e, AppError):
            log.exception("reload failed for %r", name)
        return error_response(e)
    return web.json_response({"status": "success", **info})


async def reset_batch_count(request: web.Request) -> web.Response:
    state: AppState = request.app["state"]
    state.metrics.reset_batch_count()
    return web.json_response({
        "status": "success",
        "message": "Batch count reset successfully",
    })


@web.middleware
async def cors_middleware(request: web.Request, handler):
    if request.method == "OPTIONS":
        resp = web.Response()
    else:
        resp = await handler(request)
    resp.headers["Access-Control-Allow-Origin"] = "*"
    resp.headers["Access-Control-Allow-Methods"] = "GET, POST, OPTIONS"
    resp.headers["Access-Control-Allow-Headers"] = "*"
    return resp


# ---------------------------------------------------------------------------
# app factory
# ---------------------------------------------------------------------------
def create_app(state: AppState) -> web.Application:
    app = web.Application(middlewares=[cors_middleware],
                          client_max_size=2 * C.MAX_AUDIO_BYTES)
    app["state"] = state

    async def _start_batcher(app):
        await state.batcher.start()

    async def _stop_batcher(app):
        await state.batcher.stop()

    app.on_startup.append(_start_batcher)
    app.on_cleanup.append(_stop_batcher)
    app.router.add_get("/v2/decode/stream/{model}", handle_stream)
    app.router.add_post("/v2/decode/batch/{model}", handle_batch)
    app.router.add_get("/health", health_check)
    app.router.add_get("/metrics", metrics_handler)
    app.router.add_post("/admin/reset-batch-count", reset_batch_count)
    app.router.add_get("/admin/config", get_config)
    # Triton repository-API parity (model management without a restart)
    app.router.add_get("/v2/repository/index", repository_index_handler)
    app.router.add_post("/v2/repository/index", repository_index_handler)
    app.router.add_post("/v2/repository/models/{name}/load",
                        repository_load)
    return app


def build_state(config: Optional[Config] = None,
                preset: Optional[str] = None,
                warmup: Optional[bool] = None) -> AppState:
    """Wire config -> model -> pipeline -> state (ref: src/main.rs:23-112)."""
    import jax

    cfg = config or Config.load()
    if cfg.inference_backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if cfg.enable_platform_optimizations:
        # probe host/devices/cloud and adopt the adjusted config
        # (ref: main() calls initialize_platform and uses its effective
        # config, src/main.rs:34-44, platform/init.rs:46-117)
        from ..utils.platform import initialize_platform
        cfg = initialize_platform(cfg).effective_config
    if cfg.compilation_cache_dir:
        import os
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(cfg.compilation_cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    try:
        vocab = Vocabulary.load(cfg.vocabulary_path)
    except FileNotFoundError:
        log.warning("vocabulary %s not found; using empty vocab",
                    cfg.vocabulary_path)
        vocab = Vocabulary.from_map({})
    mesh = None
    if cfg.mesh_shape and len(jax.devices()) > 1:
        from ..parallel import make_mesh
        mesh = make_mesh(cfg.mesh_shape)
        log.info("serving over mesh %s", dict(mesh.shape))
    if cfg.model_family != "transducer":
        # CTC / AED family on the same serving surface (checkpoint load,
        # sharding, dtype handling ride the shared pipeline init path)
        from ..runtime.family_pipeline import build_family_pipeline
        model, params, pipeline = build_family_pipeline(
            cfg.model_family, preset or cfg.model_preset, vocab, cfg,
            mesh=mesh)
        if cfg.checkpoint_path:
            log.info("loaded %s checkpoint from %s", cfg.model_family,
                     cfg.checkpoint_path)
    else:
        model = Transducer.from_preset(preset or cfg.model_preset)
        rng = jax.random.PRNGKey(0)
        params = jax.jit(model.init)(rng)
        if cfg.checkpoint_path:
            params = model.load_checkpoint(cfg.checkpoint_path, like=params)
            log.info("loaded checkpoint from %s", cfg.checkpoint_path)
        pipeline = AsrPipeline(model, params, vocab, cfg, mesh=mesh)
    # AppState first: it wires pipeline.on_compile to the prometheus
    # compile counter, and warmup is where most compiles happen — wiring
    # after would permanently under-report asr_xla_compilations_total
    state = AppState(pipeline, vocab, cfg)
    if warmup if warmup is not None else cfg.warmup_on_start:
        import time
        t0 = time.time()
        n = pipeline.warmup()
        log.info("warmed %d bucket programs in %.1fs", n, time.time() - t0)
        # the remaining (batch x length) buckets compile off-thread while
        # the warm set serves; the batcher packs only into warm buckets.
        # In native mode the supervisor pauses this whenever a stream is
        # live (a fresh bucket's first dispatch can hog the chip 2-85 s)
        state.start_warmup_supervisor()
        if state.lane_engine is not None:
            # warm-before-accept for native streaming: the lane engine's
            # fused chunk step is the hot path in this mode, and a cold
            # first dispatch (2-85 s on axon) inside a live stream blows
            # the per-decode budget and churns sessions (round-3 loadtest)
            took = state.lane_engine.warm()
            log.info("warmed lane engine (%d lanes) in %.1fs",
                     state.lane_engine.n_lanes, took)
    return state


async def run_server(state: AppState, host: Optional[str] = None,
                     port: Optional[int] = None) -> None:
    cfg = state.config
    app = create_app(state)
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, host or cfg.server_host,
                       port or cfg.server_port)
    await site.start()
    state.shutdown.install_signal_handlers()
    if state.affinity_plan and state.affinity_plan.enabled:
        # the event loop thread is the IO pool of the plan
        from ..utils.affinity import ThreadType, set_thread_affinity
        set_thread_affinity(state.affinity_plan.cores_for(ThreadType.IO))
    log.info("serving on %s:%s", host or cfg.server_host,
             port or cfg.server_port)
    await state.shutdown.wait_for_shutdown()
    log.info("shutdown: draining")
    drained = await state.shutdown.drain()
    log.info("drained=%s; closing", drained)
    await runner.cleanup()
    state.close()


def main(argv=None) -> None:
    import argparse
    parser = argparse.ArgumentParser(description="TPU ASR server")
    parser.add_argument("--host", default=None)
    parser.add_argument("--port", type=int, default=None)
    parser.add_argument("--preset", default=None,
                        help="model preset (tiny/base/large)")
    parser.add_argument("--config-dir", default=".")
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip startup precompilation of bucket programs")
    args = parser.parse_args(argv)

    cfg = Config.load(search_dir=args.config_dir)
    init_tracing(otel_endpoint=cfg.otel_endpoint)
    state = build_state(cfg, preset=args.preset,
                        warmup=False if args.no_warmup else None)
    asyncio.run(run_server(state, args.host, args.port))


if __name__ == "__main__":
    main()
