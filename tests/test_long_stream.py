"""Long-stream regression: transcription must CONTINUE past
MAX_TOTAL_TOKENS cumulative tokens.

The reference's MAX_TOTAL_TOKENS=200 is a counter local to each
greedy_decode call (ref: src/asr/decoder_optimized.rs:78-92,229-243) —
every chunk/window decode gets a fresh budget, so a multi-minute stream
keeps transcribing. An earlier build accumulated the count across the
session, silently muting any stream past ~200 tokens (~1 minute of
speech). These tests stream >=3 minutes of synthetic speech through both
streaming modes (chunked/parity and native) and assert the tail of the
stream still emits.
"""

import dataclasses
import pathlib

import jax
import numpy as np
import pytest

from amira_rust_asr_server_tpu import constants as C
from amira_rust_asr_server_tpu.config import Config
from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.models.presets import TINY
from amira_rust_asr_server_tpu.runtime import AsrPipeline
from amira_rust_asr_server_tpu.runtime.incremental import IncrementalAsr
from amira_rust_asr_server_tpu.runtime.lane_engine import StreamingLaneEngine
from amira_rust_asr_server_tpu.runtime.native_stream import NativeStreamSession
from amira_rust_asr_server_tpu.vocab import Vocabulary

# compile-heavy integration tier: run with the full suite, skip via -m 'not slow'
pytestmark = pytest.mark.slow

DUR_S = 185  # >= 3 minutes of audio
MAX_TOTAL = C.MAX_TOTAL_TOKENS  # 200, the reference's per-call budget


def _speech_like(rng, n):
    """Synthetic speech: loud modulated noise (reliably non-blank on the
    random-weight tiny model) with short pauses."""
    x = (rng.standard_normal(n) * 0.5).astype(np.float32)
    t = np.arange(n, dtype=np.float32) / C.SAMPLE_RATE
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 1.3 * t).astype(np.float32)
    x *= env
    # 100 ms pause every 2 s
    pause = ((t % 2.0) > 1.9)
    x[pause] = 0.0
    return x


@pytest.fixture(scope="module")
def vocab():
    return Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})


def _assert_long_stream(per_piece_counts, total):
    assert total > MAX_TOTAL, (
        f"stream went quiet: only {total} tokens over {DUR_S}s "
        f"(budget must be per decode call, not per session)")
    # the final tenth of the stream still transcribes
    tail = per_piece_counts[-max(1, len(per_piece_counts) // 10):]
    assert sum(tail) > 0, "no tokens emitted in the stream's tail"


def test_native_session_long_stream(vocab):
    cfg = dataclasses.replace(TINY, causal=True, att_context=(8, 0))
    model = Transducer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    sess = NativeStreamSession(model, params, vocab, chunk_frames=64,
                               max_total=MAX_TOTAL)
    rng = np.random.default_rng(0)
    piece = 2 * C.SAMPLE_RATE
    counts, prev = [], 0
    for _ in range(DUR_S // 2):
        sess.feed(_speech_like(rng, piece))
        n = len(sess.state.tokens)
        counts.append(n - prev)
        prev = n
    sess.end()
    _assert_long_stream(counts, len(sess.state.tokens))


def test_lane_engine_long_stream(vocab):
    cfg = dataclasses.replace(TINY, causal=True, att_context=(8, 0))
    model = Transducer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    eng = StreamingLaneEngine(model, params, vocab, n_lanes=2,
                              chunk_frames=64, max_total=MAX_TOTAL)
    lane = eng.attach()
    rng = np.random.default_rng(1)
    piece = 2 * C.SAMPLE_RATE
    counts = []
    for _ in range(DUR_S // 2):
        eng.feed(lane, _speech_like(rng, piece))
        got = 0
        while eng.lane_ready(lane):
            got += len(eng.tick().get(lane, []))
        counts.append(got)
    eng.feed(lane, np.zeros(0, np.float32), final=True)
    eng.drain(lane)
    _assert_long_stream(counts, len(eng.tokens[lane]))
    eng.detach(lane)


CKPT = pathlib.Path(__file__).resolve().parents[1] / "model-repo" / "tiny-digits"


@pytest.mark.skipif(not CKPT.exists(),
                    reason="tiny-digits checkpoint not present")
def test_chunked_mode_long_stream():
    """Parity (chunked window) mode through IncrementalAsr on the TRAINED
    digits checkpoint: a >=3-minute stream of digit sentences keeps
    transcribing past the 200-token mark (realistic ~3 tokens/s emission;
    random weights babble at the per-call cap and stall the weave, which
    is an artifact of untrained weights, not of the budget semantics)."""
    from amira_rust_asr_server_tpu.testing import (digits_vocab_map,
                                                   random_sentence,
                                                   synth_digits)
    model = Transducer.from_preset("tiny")
    params = model.load_checkpoint(str(CKPT))
    vocab = Vocabulary.from_map(digits_vocab_map())
    cfg = Config(audio_sec_buckets=[4.0], batch_buckets=[1],
                 max_total_tokens=MAX_TOTAL)
    pipe = AsrPipeline(model, params, vocab, cfg)
    inc = IncrementalAsr(pipe)
    rng = np.random.default_rng(2)
    # ~3.1 words/s continuous digit speech, >=3 minutes total
    wave = np.concatenate([
        synth_digits(random_sentence(rng, 4, 8), noise=0.004, rng=rng)
        for _ in range(110)])
    assert len(wave) >= DUR_S * C.SAMPLE_RATE
    # NOTE: the long-stream signal in chunked mode is the WOVEN TRANSCRIPT
    # (the product surface, AsrResponse.transcription) — token_ids
    # accumulate in buffer-local logit-index space and intentionally stop
    # growing once the ring buffer wraps, exactly like the reference
    # (incremental.rs:225-257 resizes to the buffer-local target slice).
    piece = 2 * C.SAMPLE_RATE
    counts, prev = [], 0
    for start in range(0, len(wave) - piece, piece):
        inc.process_chunk_samples(wave[start:start + piece])
        n = len(inc.accumulated.transcript.split())
        counts.append(n - prev)
        prev = n
    _assert_long_stream(counts, len(inc.accumulated.transcript.split()))
