"""Golden end-to-end tests: the committed tiny-digits checkpoint must make
the full serving surface emit the exact expected transcript (the reference
cannot test this — its ONNX weights are placeholders; here "the server
speaks real text" is a regression-guarded property).

Assets under model-repo/: tiny-digits (orbax), tiny-digits-vocab.txt,
produced by tools/train_digits.py (deterministic synthetic grammar).
"""

import asyncio
import pathlib

import jax
import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from amira_rust_asr_server_tpu.config import Config
from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.runtime import AsrPipeline
from amira_rust_asr_server_tpu.server import AppState, create_app
from amira_rust_asr_server_tpu.testing import synth_digits
from amira_rust_asr_server_tpu.vocab import Vocabulary

REPO = pathlib.Path(__file__).resolve().parents[1]
CKPT = REPO / "model-repo" / "tiny-digits"
VOCAB = REPO / "model-repo" / "tiny-digits-vocab.txt"

pytestmark = [
    pytest.mark.skipif(not CKPT.exists(),
                       reason="tiny-digits checkpoint not present"),
    # compile-heavy integration tier (orbax restore + e2e decodes)
    pytest.mark.slow,
]

_CACHE = {}


def digits_state(**overrides) -> AppState:
    key = tuple(sorted(overrides.items()))
    if key not in _CACHE:
        model = Transducer.from_preset("tiny")
        params = model.load_checkpoint(str(CKPT))
        vocab = Vocabulary.load(VOCAB)
        cfg = Config(audio_sec_buckets=[2.0], batch_buckets=[1, 2],
                     checkpoint_path=str(CKPT), vocabulary_path=str(VOCAB),
                     **overrides)
        _CACHE[key] = (AsrPipeline(model, params, vocab, cfg), vocab, cfg)
    pipeline, vocab, cfg = _CACHE[key]
    return AppState(pipeline, vocab, cfg)


def pcm16(words, noise=0.004, seed=7) -> bytes:
    wave = synth_digits(words, noise=noise,
                        rng=np.random.default_rng(seed))
    return (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()


def run(coro):
    return asyncio.run(coro)


async def with_client(state, fn):
    app = create_app(state)
    async with TestClient(TestServer(app)) as client:
        return await fn(client)


# ---------------------------------------------------------------------------
def test_pipeline_golden_text():
    state = digits_state()
    tr = state.pipeline.process_batch(pcm16(["two", "five", "nine"]))
    assert tr.text == "two five nine"
    assert tr.tokens == [3, 6, 10]


def test_http_batch_golden_transcript():
    async def go(client):
        resp = await client.post(
            "/v2/decode/batch/default",
            json={"audio_buffer": list(pcm16(
                ["seven", "one", "zero", "four"]))})
        assert resp.status == 200
        body = await resp.json()
        assert body["status"] == "COMPLETE"
        assert body["transcription"] == "seven one zero four"
        words = body["metadata"]["words"]
        assert [w["word"] for w in words] == ["seven", "one", "zero", "four"]
        # timestamps monotone nondecreasing
        starts = [w["start_s"] for w in words]
        assert starts == sorted(starts)
    run(with_client(digits_state(), go))


async def _ws_drain_final(ws):
    while True:
        msg = await asyncio.wait_for(ws.receive(), timeout=180)
        if msg.type.name in ("CLOSE", "CLOSING", "CLOSED"):
            return None
        body = msg.json()
        if body["status"] == "COMPLETE":
            return body


def test_ws_stream_golden_transcript():
    """Whole utterance in one frame + END: the carried-state decode must
    reproduce the exact text over the WS surface."""
    async def go(client):
        ws = await client.ws_connect("/v2/decode/stream/default")
        await ws.send_bytes(pcm16(["eight", "three", "six"], seed=11))
        await ws.send_bytes(bytes([0xFF]))  # END
        final = await _ws_drain_final(ws)
        await ws.close()
        assert final is not None
        assert final["transcription"] == "eight three six"
    run(with_client(digits_state(), go))


def test_ws_stream_paced_chunks_words_survive():
    """Paced 100 ms chunks ride the chunked window-redecode + weaving path
    (reference parity mode). Window re-decode of a toy model garbles
    boundaries by design, so assert robust properties, not exact text:
    a COMPLETE final arrives and the first spoken word survives weaving."""
    async def go(client):
        ws = await client.ws_connect("/v2/decode/stream/default")
        pcm = pcm16(["eight", "three", "six"], seed=11)
        step = 3200
        for i in range(0, len(pcm), step):
            await ws.send_bytes(pcm[i:i + step])
        await ws.send_bytes(bytes([0xFF]))
        final = await _ws_drain_final(ws)
        await ws.close()
        assert final is not None
        assert "eight" in final["transcription"]
    run(with_client(digits_state(), go))


def test_beam_mode_golden_transcript():
    async def go(client):
        resp = await client.post(
            "/v2/decode/batch/default",
            json={"audio_buffer": list(pcm16(["nine", "nine", "one"],
                                             seed=3))})
        assert resp.status == 200
        body = await resp.json()
        assert body["transcription"] == "nine nine one"
    run(with_client(digits_state(decoding_mode="beam", beam_width=4), go))
