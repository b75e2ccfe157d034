"""Batched native streaming lane engine: per-lane equivalence with the
single-stream session, concurrent independence, lane reuse."""

import dataclasses

import jax
import numpy as np
import pytest

from amira_rust_asr_server_tpu.models import Transducer
from amira_rust_asr_server_tpu.models.presets import TINY
from amira_rust_asr_server_tpu.runtime.lane_engine import StreamingLaneEngine
from amira_rust_asr_server_tpu.runtime.native_stream import (
    NativeStreamSession)
from amira_rust_asr_server_tpu.vocab import Vocabulary


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(TINY, causal=True, att_context=(8, 0))
    model = Transducer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params["joint"]["out"]["b"] = (
        params["joint"]["out"]["b"].at[cfg.blank_id].add(2.0))
    vocab = Vocabulary.from_map({i: f"▁w{i}" for i in range(15)})
    return model, params, vocab


def _wave(seed, n=16000):
    return (np.random.default_rng(seed).standard_normal(n) * 0.3
            ).astype(np.float32)


def solo_tokens(model, params, vocab, wave):
    sess = NativeStreamSession(model, params, vocab, chunk_frames=16,
                               norm="none")
    sess.feed(wave)
    return sess.end().tokens


@pytest.mark.slow
def test_single_lane_matches_solo_session(setup):
    model, params, vocab = setup
    wave = _wave(0)
    want = solo_tokens(model, params, vocab, wave)

    eng = StreamingLaneEngine(model, params, vocab, n_lanes=4,
                              chunk_frames=16, norm="none")
    lane = eng.attach()
    assert lane == 0
    for i in range(0, wave.shape[0], 3200):
        eng.feed(lane, wave[i:i + 3200])
        eng.tick()
    eng.feed(lane, np.zeros(0, np.float32), final=True)
    eng.drain(lane)
    assert eng.tokens[lane] == want


@pytest.mark.slow
def test_concurrent_lanes_independent(setup):
    model, params, vocab = setup
    waves = [_wave(s) for s in (1, 2, 3)]
    wants = [solo_tokens(model, params, vocab, w) for w in waves]

    eng = StreamingLaneEngine(model, params, vocab, n_lanes=4,
                              chunk_frames=16, norm="none")
    lanes = [eng.attach() for _ in waves]
    # interleave feeds; lanes advance together in shared ticks
    for i in range(0, 16000, 3200):
        for lane, w in zip(lanes, waves):
            eng.feed(lane, w[i:i + 3200])
        eng.tick()
    for lane in lanes:
        eng.feed(lane, np.zeros(0, np.float32), final=True)
        eng.drain(lane)
    for lane, want in zip(lanes, wants):
        assert eng.tokens[lane] == want


@pytest.mark.slow
def test_staggered_start_and_lane_reuse(setup):
    model, params, vocab = setup
    w1, w2 = _wave(4), _wave(5)
    want1 = solo_tokens(model, params, vocab, w1)
    want2 = solo_tokens(model, params, vocab, w2)

    eng = StreamingLaneEngine(model, params, vocab, n_lanes=2,
                              chunk_frames=16, norm="none")
    a = eng.attach()
    eng.feed(a, w1[:8000])
    eng.tick()
    # second stream arrives mid-flight of the first
    b = eng.attach()
    eng.feed(b, w2[:8000])
    eng.feed(a, w1[8000:])
    eng.tick()
    eng.feed(b, w2[8000:])
    eng.feed(a, np.zeros(0, np.float32), final=True)
    eng.drain(a)
    eng.feed(b, np.zeros(0, np.float32), final=True)
    eng.drain(b)
    assert eng.tokens[a] == want1
    assert eng.tokens[b] == want2

    # detach + reattach reuses the lane with fresh state
    toks_a = list(eng.tokens[a])
    eng.detach(a)
    a2 = eng.attach()
    assert a2 == a
    eng.feed(a2, w1)
    eng.feed(a2, np.zeros(0, np.float32), final=True)
    eng.drain(a2)
    assert eng.tokens[a2] == want1 == toks_a


def test_capacity_exhaustion(setup):
    model, params, vocab = setup
    eng = StreamingLaneEngine(model, params, vocab, n_lanes=2,
                              chunk_frames=16, norm="none")
    assert eng.attach() == 0
    assert eng.attach() == 1
    assert eng.attach() is None
    eng.detach(0)
    assert eng.attach() == 0
    # shed + attach accounting
    assert eng.stats.sheds == 1
    assert eng.stats.attaches == 3


def test_warm_is_state_invariant(setup):
    """warm() pre-dispatches the fused step + reset programs without
    changing what any later stream decodes (all-inactive step, masked
    select) — warm-before-accept must be invisible to lanes."""
    model, params, vocab = setup
    wave = _wave(6)
    want = solo_tokens(model, params, vocab, wave)

    eng = StreamingLaneEngine(model, params, vocab, n_lanes=4,
                              chunk_frames=16, norm="none")
    assert not eng.warmed_up
    took = eng.warm()
    assert eng.warmed_up and took > 0
    lane = eng.attach()
    for i in range(0, wave.shape[0], 3200):
        eng.feed(lane, wave[i:i + 3200])
        eng.tick()
    eng.feed(lane, np.zeros(0, np.float32), final=True)
    eng.drain(lane)
    assert eng.tokens[lane] == want


def test_tick_stats_observability(setup):
    """Native-mode hot-path stats: ticks, lanes-per-tick, durations all
    count (round-3 gap: 16 live native streams showed zeros at /metrics)."""
    model, params, vocab = setup
    eng = StreamingLaneEngine(model, params, vocab, n_lanes=4,
                              chunk_frames=16, norm="none")
    a, b = eng.attach(), eng.attach()
    # 2960 samples -> 17 mel frames: exactly one 16-frame chunk ready,
    # 1 leftover (below the ready threshold)
    for lane, seed in ((a, 7), (b, 8)):
        eng.feed(lane, _wave(seed, 2960))
    eng.tick()
    eng.feed(a, _wave(9, 2960))
    eng.tick()
    s = eng.stats.to_json(eng.live_lanes, eng.n_lanes, eng.warmed_up)
    assert s["ticks"] == 2
    assert s["lanes_stepped_total"] == 3
    assert s["max_lanes_per_tick"] == 2
    assert s["mean_lanes_per_tick"] == 1.5
    assert s["live_lanes"] == 2 and s["n_lanes"] == 4
    assert s["last_tick_ms"] > 0 and s["tick_ms_ewma"] > 0
