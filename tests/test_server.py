"""Server surface tests: routes, validation, WS protocol, admission control
(ref surface: src/server/handlers.rs, src/server/stream.rs).

No pytest-asyncio in the image; each test drives an aiohttp TestClient
inside asyncio.run().
"""

import asyncio
import base64
import json

import jax
import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from amira_rust_asr_server_tpu import constants as C
from amira_rust_asr_server_tpu.config import Config
from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.runtime import AsrPipeline
from amira_rust_asr_server_tpu.server import AppState, create_app
from amira_rust_asr_server_tpu.vocab import Vocabulary

_STATE_CACHE = {}


def make_state(**cfg_overrides) -> AppState:
    key = tuple(sorted(cfg_overrides.items()))
    if key not in _STATE_CACHE:
        model = Transducer.from_preset("tiny")
        params = model.init(jax.random.PRNGKey(0))
        vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
        cfg = Config(audio_sec_buckets=[0.5, 2.0], batch_buckets=[1, 2],
                     max_symbols_per_step=5, max_total_tokens=50,
                     **cfg_overrides)
        pipeline = AsrPipeline(model, params, vocab, cfg)
        _STATE_CACHE[key] = (model, params, vocab, cfg, pipeline)
    model, params, vocab, cfg, pipeline = _STATE_CACHE[key]
    return AppState(pipeline, vocab, cfg)


def run(coro):
    return asyncio.run(coro)


async def with_client(state, fn):
    app = create_app(state)
    async with TestClient(TestServer(app)) as client:
        return await fn(client)


def _pcm_list(n=3200, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-3000, 3000, n, dtype=np.int16).tobytes()


# ---------------------------------------------------------------------------
def test_health():
    async def go(client):
        resp = await client.get("/health")
        assert resp.status == 200
        body = await resp.json()
        assert body["status"] == "healthy"
    run(with_client(make_state(), go))


def test_metrics_json():
    async def go(client):
        resp = await client.get("/metrics")
        body = await resp.json()
        assert body["active_streams"] == 0
        assert body["max_streams"] == 10
        assert "circuit_breaker" in body
    run(with_client(make_state(), go))


def test_batch_decode_roundtrip():
    async def go(client):
        pcm = _pcm_list()
        resp = await client.post(
            "/v2/decode/batch/default",
            json={"audio_buffer": list(pcm), "opaque": {"req": 7}})
        assert resp.status == 200
        body = await resp.json()
        assert body["status"] == "COMPLETE"
        assert isinstance(body["transcription"], str)
        assert body["opaque"] == {"req": 7}
        md = body["metadata"]
        assert md["audio_length_samples"] == len(pcm) // 2
        assert md["features_length"] == 1 + (len(pcm) // 2) // 160
        assert isinstance(md["tokens"], list)
    run(with_client(make_state(), go))


def test_batch_decode_base64():
    async def go(client):
        pcm = _pcm_list()
        resp = await client.post(
            "/v2/decode/batch/default",
            json={"audio_buffer": base64.b64encode(pcm).decode()})
        assert resp.status == 200
        body = await resp.json()
        assert body["status"] == "COMPLETE"
        # opaque omitted when not provided
        assert "opaque" not in body
    run(with_client(make_state(), go))


@pytest.mark.parametrize("payload,frag", [
    ({"audio_buffer": []}, "empty"),
    ({"audio_buffer": [1, 2, 3]}, "even"),
    ({}, "required"),
    ({"audio_buffer": "!!!notb64"}, "base64"),
    ({"audio_buffer": [0, 1],
      "opaque": {"x": "y" * 11_000}}, "Opaque"),
])
def test_batch_validation_errors(payload, frag):
    async def go(client):
        resp = await client.post("/v2/decode/batch/default", json=payload)
        assert resp.status == 400
        body = await resp.json()
        assert frag.lower() in body["message"].lower()
    run(with_client(make_state(), go))


def test_batch_audio_too_long():
    async def go(client):
        n = int(C.MAX_BATCH_AUDIO_LENGTH_SECS * C.SAMPLE_RATE + 16000) * 2
        resp = await client.post(
            "/v2/decode/batch/default",
            json={"audio_buffer": base64.b64encode(b"\0" * n).decode()})
        assert resp.status == 400
        body = await resp.json()
        assert "too long" in body["message"].lower()
    run(with_client(make_state(), go))


def test_batch_capacity_rejection():
    async def go(client):
        state = client.app["state"]
        state.batch_semaphore._held = state.batch_semaphore.limit
        resp = await client.post(
            "/v2/decode/batch/default",
            json={"audio_buffer": [0, 1]})
        assert resp.status == 503
        state.batch_semaphore._held = 0
    run(with_client(make_state(), go))


def test_reset_batch_count():
    async def go(client):
        state = client.app["state"]
        state.metrics.active_batches = 5
        resp = await client.post("/admin/reset-batch-count")
        assert resp.status == 200
        assert state.metrics.active_batches == 0
    run(with_client(make_state(), go))


# ---------------------------------------------------------------------------
# WebSocket streaming
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_ws_stream_partials_and_complete():
    async def go(client):
        ws = await client.ws_connect("/v2/decode/stream/default")
        pcm = _pcm_list(n=16000)  # 1 s
        # send in 0.25 s chunks -> partials after each >=0.1s accumulation
        for i in range(0, len(pcm), 8000):
            await ws.send_bytes(pcm[i:i + 8000])
        # collect a partial (skipping slow-decode heartbeat frames, which
        # carry no metadata — a cold CPU decode can exceed the keepalive
        # period)
        while True:
            msg = await asyncio.wait_for(ws.receive_json(), timeout=180)
            if msg.get("message") != "processing":
                break
        assert msg["status"] in ("ACTIVE", "COMPLETE")
        assert "transcription" in msg
        assert "audio_length_seconds" in msg["metadata"]
        # end-of-stream control byte
        await ws.send_bytes(bytes([C.CONTROL_BYTE_END]))
        final = None
        while True:
            raw = await asyncio.wait_for(ws.receive(), timeout=180)
            if raw.type.name in ("CLOSE", "CLOSED", "CLOSING"):
                break
            data = json.loads(raw.data)
            final = data
            if data["status"] == "COMPLETE":
                break
        assert final is not None and final["status"] == "COMPLETE"
        await ws.close()
    run(with_client(make_state(), go))


@pytest.mark.slow
def test_ws_end_error_frame_parity():
    """With end_error_frame_parity=True the END control byte produces the
    reference's exact wire sequence: an ERROR-status frame ("Server error:
    Request validation error: End of stream") FOLLOWED by the final
    COMPLETE (ref: stream.rs:236-244 routes END through the error path;
    message format per error.rs:144,208). Default (off) sends COMPLETE
    only — asserted by test_ws_stream_partials_and_complete."""
    async def go(client):
        ws = await client.ws_connect("/v2/decode/stream/default")
        await ws.send_bytes(_pcm_list(n=8000))  # 0.5 s
        await ws.send_bytes(bytes([C.CONTROL_BYTE_END]))
        statuses = []
        while True:
            raw = await asyncio.wait_for(ws.receive(), timeout=180)
            if raw.type.name in ("CLOSE", "CLOSED", "CLOSING"):
                break
            data = json.loads(raw.data)
            statuses.append(data["status"])
            if data["status"] == "ERROR":
                assert data["message"] == (
                    "Server error: Request validation error: End of stream")
            if data["status"] == "COMPLETE":
                break
        assert "ERROR" in statuses and statuses[-1] == "COMPLETE"
        assert statuses.index("ERROR") < statuses.index("COMPLETE")
        await ws.close()
    run(with_client(make_state(end_error_frame_parity=True), go))


def test_ws_stream_survives_transient_queue_full():
    """A queue-full during a partial's re-decode is a load signal: the
    stream must shed that ONE partial (status ACTIVE, 'busy' message) and
    keep the session alive — the buffered audio re-decodes with the next
    chunk / final drain. Closing the stream (the old behavior) lost the
    carried state and forced a client reconnect."""
    from amira_rust_asr_server_tpu.errors import CapacityExceededError

    async def go(client):
        state = client.app["state"]
        real = state.batcher.submit_from_thread
        calls = {"n": 0}

        def flaky(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise CapacityExceededError("stream inference queue is full")
            return real(*a, **k)

        state.batcher.submit_from_thread = flaky
        try:
            ws = await client.ws_connect("/v2/decode/stream/default")
            pcm = _pcm_list(n=8000)
            await ws.send_bytes(pcm)  # 0.5 s -> triggers a partial
            msg = await asyncio.wait_for(ws.receive_json(), timeout=60)
            assert msg["status"] == "ACTIVE"
            assert "busy" in (msg.get("message") or "")
            # session is still alive: next chunk decodes fine
            await ws.send_bytes(pcm)
            await ws.send_bytes(bytes([C.CONTROL_BYTE_END]))
            final = None
            while True:
                raw = await asyncio.wait_for(ws.receive(), timeout=60)
                if raw.type.name in ("CLOSE", "CLOSED", "CLOSING"):
                    break
                final = json.loads(raw.data)
                if final["status"] == "COMPLETE":
                    break
            assert final is not None and final["status"] == "COMPLETE"
            assert calls["n"] >= 2  # the retry actually decoded
            await ws.close()
        finally:
            state.batcher.submit_from_thread = real
    run(with_client(make_state(), go))


def test_ws_keepalive_pause():
    async def go(client):
        ws = await client.ws_connect("/v2/decode/stream/default")
        await ws.send_bytes(bytes([C.CONTROL_BYTE_KEEPALIVE]))
        msg = await asyncio.wait_for(ws.receive_json(), timeout=10)
        assert msg["status"] == "PAUSED"
        await ws.close()
    run(with_client(make_state(), go))


def test_ws_unknown_control_byte_errors():
    async def go(client):
        ws = await client.ws_connect("/v2/decode/stream/default")
        await ws.send_bytes(bytes([0x42]))
        msg = await asyncio.wait_for(ws.receive_json(), timeout=10)
        assert msg["status"] == "ERROR"
        assert "control" in msg["message"].lower()
        await ws.close()
    run(with_client(make_state(), go))


def test_ws_odd_length_frame_errors():
    async def go(client):
        ws = await client.ws_connect("/v2/decode/stream/default")
        await ws.send_bytes(b"\x01\x02\x03")
        msg = await asyncio.wait_for(ws.receive_json(), timeout=10)
        assert msg["status"] == "ERROR"
        await ws.close()
    run(with_client(make_state(), go))


def test_ws_stream_capacity_rejection():
    async def go(client):
        state = client.app["state"]
        state.stream_semaphore._held = state.stream_semaphore.limit
        ws = await client.ws_connect("/v2/decode/stream/default")
        msg = await asyncio.wait_for(ws.receive(), timeout=10)
        assert msg.type.name in ("CLOSE", "CLOSED")
        state.stream_semaphore._held = 0
    run(with_client(make_state(), go))


def make_native_state():
    model = Transducer.from_preset("tiny-streaming")
    params = model.init(jax.random.PRNGKey(0))
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
    cfg = Config(audio_sec_buckets=[0.5, 2.0], batch_buckets=[1, 2],
                 max_symbols_per_step=5, max_total_tokens=50,
                 streaming_mode="native", native_chunk_frames=16,
                 native_norm="none")
    pipeline = AsrPipeline(model, params, vocab, cfg)
    return AppState(pipeline, vocab, cfg)


@pytest.mark.slow
def test_ws_native_streaming_mode():
    async def go(client):
        ws = await client.ws_connect("/v2/decode/stream/default")
        pcm = _pcm_list(n=16000, seed=7)
        prev = ""
        for i in range(0, len(pcm), 8000):
            await ws.send_bytes(pcm[i:i + 8000])
            msg = await asyncio.wait_for(ws.receive_json(), timeout=60)
            assert msg["status"] == "ACTIVE"
            # native transcripts are append-only
            assert msg["transcription"].startswith(prev)
            prev = msg["transcription"]
        await ws.send_bytes(bytes([C.CONTROL_BYTE_END]))
        while True:
            raw = await asyncio.wait_for(ws.receive(), timeout=60)
            if raw.type.name in ("CLOSE", "CLOSED", "CLOSING"):
                break
            data = json.loads(raw.data)
            if data["status"] == "COMPLETE":
                assert data["transcription"].startswith(prev)
                break
        await ws.close()
    run(with_client(make_native_state(), go))


@pytest.mark.slow
def test_ws_native_concurrent_streams_share_lanes():
    async def go(client):
        state = client.app["state"]
        assert state.lane_engine is not None

        async def one_stream(seed):
            ws = await client.ws_connect("/v2/decode/stream/default")
            pcm = _pcm_list(n=16000, seed=seed)
            texts = []
            for i in range(0, len(pcm), 8000):
                await ws.send_bytes(pcm[i:i + 8000])
                msg = await asyncio.wait_for(ws.receive_json(), timeout=60)
                texts.append(msg["transcription"])
            await ws.send_bytes(bytes([C.CONTROL_BYTE_END]))
            final = None
            while True:
                raw = await asyncio.wait_for(ws.receive(), timeout=60)
                if raw.type.name in ("CLOSE", "CLOSED", "CLOSING"):
                    break
                data = json.loads(raw.data)
                if data["status"] == "COMPLETE":
                    final = data["transcription"]
                    break
            await ws.close()
            return final

        finals = await asyncio.gather(one_stream(11), one_stream(12),
                                      one_stream(13))
        assert all(f is not None for f in finals)
        # lanes were released on finalize
        assert all(f is None for f in state.lane_engine.featurizers)
    run(with_client(make_native_state(), go))


def make_native_beam_state():
    model = Transducer.from_preset("tiny-streaming")
    params = model.init(jax.random.PRNGKey(0))
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
    cfg = Config(audio_sec_buckets=[0.5, 2.0], batch_buckets=[1, 2],
                 streaming_mode="native", native_chunk_frames=16,
                 native_norm="none", decoding_mode="beam", beam_width=4,
                 compute_dtype="float32")
    pipeline = AsrPipeline(model, params, vocab, cfg)
    return AppState(pipeline, vocab, cfg)


@pytest.mark.slow
def test_ws_native_beam_streaming():
    """decoding_mode=beam + streaming_mode=native serves WS sessions with
    carried beam hypotheses (parity-plus: the reference's k2 beam is
    batch-only). Partials may retract when the beam leader changes, so
    only status/protocol invariants are asserted, not append-only."""
    async def go(client):
        from amira_rust_asr_server_tpu.server.stream import \
            _BeamStreamAdapter
        ws = await client.ws_connect("/v2/decode/stream/default")
        state = client.app["state"]
        pcm = _pcm_list(n=16000, seed=7)
        for i in range(0, len(pcm), 8000):
            await ws.send_bytes(pcm[i:i + 8000])
            msg = await asyncio.wait_for(ws.receive_json(), timeout=60)
            assert msg["status"] == "ACTIVE"
            assert isinstance(msg["transcription"], str)
        # the live processor rides the beam adapter, not the lane engine
        procs = list(state.active_streams.values())
        assert procs and all(isinstance(p.incremental, _BeamStreamAdapter)
                             for p in procs)
        await ws.send_bytes(bytes([C.CONTROL_BYTE_END]))
        got_complete = False
        while True:
            raw = await asyncio.wait_for(ws.receive(), timeout=60)
            if raw.type.name in ("CLOSE", "CLOSED", "CLOSING"):
                break
            data = json.loads(raw.data)
            if data["status"] == "COMPLETE":
                got_complete = True
                break
        assert got_complete
        await ws.close()
    run(with_client(make_native_beam_state(), go))


@pytest.mark.slow
def test_native_metrics_expose_lane_engine():
    """/metrics carries the lane-engine section in native mode, and it
    counts after streaming (round-3 gap: native hot path was invisible —
    batcher zeros under 16 live streams)."""
    async def go(client):
        resp = await client.get("/metrics")
        m = await resp.json()
        assert "lane_engine" in m
        assert m["lane_engine"]["ticks"] == 0

        ws = await client.ws_connect("/v2/decode/stream/default")
        await ws.send_bytes(_pcm_list(n=16000, seed=21))
        await asyncio.wait_for(ws.receive_json(), timeout=60)
        await ws.send_bytes(bytes([C.CONTROL_BYTE_END]))
        while True:
            raw = await asyncio.wait_for(ws.receive(), timeout=60)
            if raw.type.name in ("CLOSE", "CLOSED", "CLOSING"):
                break
            if json.loads(raw.data)["status"] == "COMPLETE":
                break
        await ws.close()

        resp = await client.get("/metrics")
        m = (await resp.json())["lane_engine"]
        assert m["ticks"] >= 1
        assert m["lanes_stepped_total"] >= 1
        assert m["attaches"] >= 1
        assert m["last_tick_ms"] > 0
        assert m["n_lanes"] > 0
    run(with_client(make_native_state(), go))


@pytest.mark.slow
def test_stream_heartbeat_during_slow_decode():
    """A decode slower than the keepalive period emits ACTIVE
    "processing" heartbeats carrying the last transcript, so clients
    with receive timeouts don't abandon the session during cold-dispatch
    spikes (round-3 native loadtest reconnect storm)."""
    async def go(client):
        state = client.app["state"]
        # every decode is slow: patch BEFORE the stream session is built
        # (IncrementalAsr captures the decode fn at construction)
        import time as _t
        orig = state.batcher.submit_from_thread

        def slow(*a, **kw):
            _t.sleep(0.4)
            return orig(*a, **kw)
        state.batcher.submit_from_thread = slow
        try:
            ws = await client.ws_connect("/v2/decode/stream/default")
            await ws.send_bytes(_pcm_list(n=6400, seed=31))
            got_heartbeat = False
            while True:
                msg = await asyncio.wait_for(ws.receive_json(), timeout=60)
                if msg.get("message") == "processing":
                    got_heartbeat = True
                    assert msg["status"] == "ACTIVE"
                    continue
                assert msg["status"] == "ACTIVE"
                break
            await ws.send_bytes(bytes([C.CONTROL_BYTE_END]))
            await ws.close()
            assert got_heartbeat
        finally:
            state.batcher.submit_from_thread = orig
    run(with_client(make_state(keepalive_check_period_ms=50), go))


def test_beam_mode_exposes_decode_path():
    """Beam responses carry metadata.decode_path and /metrics counts the
    kernel-vs-scan routing decisions."""
    async def go(client):
        pcm = _pcm_list(n=6400, seed=41)
        resp = await client.post("/v2/decode/batch/default",
                                 json={"audio_buffer": list(pcm)})
        assert resp.status == 200
        body = await resp.json()
        assert body["metadata"]["decode_path"] == "xla_scan"  # CPU backend
        resp = await client.get("/metrics")
        m = await resp.json()
        assert m["beam_decode_paths"]["xla_scan"] >= 1
    run(with_client(make_state(decoding_mode="beam", beam_width=2,
                               compute_dtype="float32"), go))


def test_deep_health_probe():
    async def go(client):
        resp = await client.get("/health?deep=1")
        assert resp.status == 200
        body = await resp.json()
        assert body["device"]["probe"] is True
    run(with_client(make_state(), go))


def test_admin_config_endpoint():
    async def go(client):
        resp = await client.get("/admin/config")
        assert resp.status == 200
        body = await resp.json()
        assert body["max_concurrent_streams"] == 10
        assert body["model_config"]["vocab_size"] == 16  # tiny preset
    run(with_client(make_state(), go))
