"""Protocol robustness: fuzzed WS frames, prometheus exposition, rate
limiting, oversized frames."""

import asyncio
import json

import numpy as np
import pytest
from aiohttp import WSMsgType

from amira_rust_asr_server_tpu import constants as C
from amira_rust_asr_server_tpu.server.stream import RateLimiter

import sys
sys.path.insert(0, "tests")
from test_server import make_state, run, with_client  # noqa: E402


def test_ws_random_frames_never_crash_server():
    """Random garbage frames either produce a JSON response or a clean
    error frame — the server must keep serving afterwards."""
    async def go(client):
        rng = np.random.default_rng(0)
        for trial in range(6):
            ws = await client.ws_connect("/v2/decode/stream/default")
            n = int(rng.integers(1, 5000))
            if n % 2 == 1 and n != 1:
                n += 1  # mostly-valid sizes; odd handled separately
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            await ws.send_bytes(data)
            try:
                msg = await asyncio.wait_for(ws.receive(), timeout=30)
                if msg.type == WSMsgType.TEXT:
                    payload = json.loads(msg.data)
                    assert payload["status"] in ("ACTIVE", "ERROR",
                                                 "PAUSED", "COMPLETE")
            except asyncio.TimeoutError:
                pass  # short valid audio below the partial threshold
            await ws.close()
        # server still healthy
        resp = await client.get("/health")
        assert resp.status == 200
    run(with_client(make_state(), go))


def test_ws_text_frames_ignored():
    async def go(client):
        ws = await client.ws_connect("/v2/decode/stream/default")
        await ws.send_str("not audio")
        # then real audio still works
        pcm = np.random.default_rng(1).integers(
            -3000, 3000, 8000, dtype=np.int16).tobytes()
        await ws.send_bytes(pcm)
        msg = await asyncio.wait_for(ws.receive_json(), timeout=30)
        assert msg["status"] == "ACTIVE"
        await ws.close()
    run(with_client(make_state(), go))


def test_rate_limiter_window():
    rl = RateLimiter(max_messages=5, window_secs=60)
    assert all(rl.check() for _ in range(5))
    assert not rl.check()  # 6th in window rejected


def test_prometheus_exposition():
    async def go(client):
        resp = await client.get("/metrics")
        body = await resp.text()
        assert "asr_requests_total" in body
        assert "asr_active_streams" in body
        # drive a request and see the counter move
        pcm = np.random.default_rng(2).integers(
            -3000, 3000, 3200, dtype=np.int16).tobytes()
        r = await client.post("/v2/decode/batch/default",
                              json={"audio_buffer": list(pcm)})
        assert r.status == 200
        body = await (await client.get("/metrics")).text()
        assert 'asr_requests_total_total{kind="batch",status="ok"}' in body \
            or 'asr_requests_total{kind="batch",status="ok"}' in body
    run(with_client(make_state(metrics_backend="prometheus"), go))


def test_batch_concurrent_mixed_valid_invalid():
    async def go(client):
        rng = np.random.default_rng(3)
        pcm = rng.integers(-3000, 3000, 3200, dtype=np.int16).tobytes()

        async def good():
            r = await client.post("/v2/decode/batch/default",
                                  json={"audio_buffer": list(pcm)})
            return r.status

        async def bad():
            r = await client.post("/v2/decode/batch/default",
                                  json={"audio_buffer": [1, 2, 3]})
            return r.status

        statuses = await asyncio.gather(good(), bad(), good(), bad())
        assert statuses == [200, 400, 200, 400]
    run(with_client(make_state(), go))
