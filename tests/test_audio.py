"""Audio subsystem tests: PCM conversion vs NumPy oracle, ring buffer,
overlapping windows (ref behaviors: src/asr/audio.rs)."""

import numpy as np
import pytest

from amira_rust_asr_server_tpu.audio import (
    AudioRingBuffer, OverlappingAudioBuffer, f32_to_pcm16_bytes,
    mean_amplitude, pcm16_bytes_to_f32, peak_window_energy, window_sequence)
from amira_rust_asr_server_tpu.constants import SAMPLE_RATE


# -- PCM conversion ---------------------------------------------------------
def test_pcm16_to_f32_matches_oracle(rng):
    raw = rng.integers(-32768, 32768, size=1001, dtype=np.int16)
    got = pcm16_bytes_to_f32(raw.tobytes())
    want = raw.astype(np.float32) / 32768.0
    np.testing.assert_array_equal(got, want)


def test_pcm16_odd_length_rejected():
    with pytest.raises(ValueError):
        pcm16_bytes_to_f32(b"\x01\x02\x03")


def test_pcm_roundtrip(rng):
    samples = (rng.random(500, dtype=np.float32) * 2 - 1) * 0.9
    back = pcm16_bytes_to_f32(f32_to_pcm16_bytes(samples))
    np.testing.assert_allclose(back, samples, atol=1.0 / 32768.0)


def test_f32_to_pcm_clamps():
    out = np.frombuffer(
        f32_to_pcm16_bytes(np.array([2.0, -2.0], np.float32)), dtype="<i2")
    assert out[0] == 32767 and out[1] == -32768


def test_mean_amplitude(rng):
    x = rng.standard_normal(10_000).astype(np.float32)
    assert abs(mean_amplitude(x) - np.mean(np.abs(x))) < 1e-4
    assert mean_amplitude(np.zeros(0, np.float32)) == 0.0


def test_peak_window_energy_matches_oracle(rng):
    x = rng.standard_normal(5000).astype(np.float32) * 0.1
    x[2000:2800] *= 10  # loud burst
    got = peak_window_energy(x, window=800)
    sq = x.astype(np.float64) ** 2
    sums = np.convolve(sq, np.ones(800), mode="valid") / 800
    want = float(np.sqrt(sums.max()))
    assert abs(got - want) < 1e-4


# -- ring buffer ------------------------------------------------------------
def test_ring_buffer_fifo():
    rb = AudioRingBuffer(16)
    assert rb.write(b"abcdefgh") == 8
    assert rb.available_read() == 8
    assert rb.read(4) == b"abcd"
    assert rb.write(b"ijklmnop") == 8  # wraps
    assert rb.read(12) == b"efghijklmnop"
    assert rb.is_empty()


def test_ring_buffer_overflow_drops():
    rb = AudioRingBuffer(8)
    assert rb.write(b"12345678") == 8
    assert rb.write(b"x") == 0  # full: drop
    assert rb.read(8) == b"12345678"


def test_ring_buffer_wraparound_many():
    rb = AudioRingBuffer(7)
    acc = bytearray()
    src = bytes(range(256))
    i = 0
    while i < 250:
        n = rb.write(src[i:i + 5])
        i += n
        acc += rb.read(3)
    acc += rb.read(10)
    assert bytes(acc) == src[:i]


# -- window sequence (exact parity with audio.rs:72-132) --------------------
def test_window_sequence_single_short_window():
    wins = list(window_sequence(100, 200, 50, 25))
    assert len(wins) == 1
    src, tgt, ratio = wins[0]
    assert (src.start, src.end) == (0, 100)
    assert (tgt.start, tgt.end) == (0, 100)  # offset=min(50, 0)=0
    # short final window: overlap = 75 + (start - max(0, end-window)) = 75+0
    assert ratio == pytest.approx(75 / 200)


def test_window_sequence_advancement():
    # window=100, lead=20, trail=10 -> stride 70
    wins = list(window_sequence(300, 100, 20, 10))
    starts = [w[0].start for w in wins]
    assert starts == [0, 70, 140, 210]
    # middle window target starts at start+leading
    assert wins[1][1].start == 90
    # last window runs to the end
    assert wins[-1][0].end == 300


def test_window_sequence_terminates():
    # pathological: contexts sum >= window would loop in a naive port
    wins = list(window_sequence(1000, 100, 20, 10))
    assert wins[-1][0].end == 1000
    assert len(wins) < 50


# -- overlapping audio buffer ----------------------------------------------
def test_overlapping_buffer_accumulates(rng):
    buf = OverlappingAudioBuffer(SAMPLE_RATE * 10, 2.0, 1.0, 0.5)
    a = rng.standard_normal(SAMPLE_RATE).astype(np.float32)
    buf.add_samples(a)
    assert buf.get_window().shape[0] == SAMPLE_RATE
    buf.add_samples(a)
    assert buf.get_window().shape[0] == 2 * SAMPLE_RATE
    assert buf.mean_amplitude() > 0


def test_overlapping_buffer_overflow_keeps_context():
    cap = 1000
    buf = OverlappingAudioBuffer(cap, 2.0, 1.0, 0.5)
    buf.leading_context = 100  # shrink for the test
    buf.add_samples(np.arange(900, dtype=np.float32))
    buf.add_samples(np.arange(900, 1100, dtype=np.float32))
    w = buf.get_window()
    # kept last 100 of old + 200 new
    assert w.shape[0] == 300
    assert w[0] == 800.0
    assert w[-1] == 1099.0


def test_ema_mean_amplitude():
    buf = OverlappingAudioBuffer(10_000, 2.0, 1.0, 0.5)
    buf.add_samples(np.full(100, 1.0, np.float32))
    assert buf.mean_amplitude() == pytest.approx(1.0)
    buf.add_samples(np.full(100, 0.0, np.float32))
    assert buf.mean_amplitude() == pytest.approx(0.7)  # 0.7*1 + 0.3*0
