"""Tests for the measurement/diagnostic tools' pure functions."""

import sys
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from eval_wer import edit_distance_words, load_wav, normalize_text  # noqa: E402


def test_edit_distance_exact():
    e, s, d, i = edit_distance_words("a b c".split(), "a b c".split())
    assert (e, s, d, i) == (0, 0, 0, 0)


def test_edit_distance_substitution():
    e, s, d, i = edit_distance_words("the cat sat".split(),
                                     "the bat sat".split())
    assert e == 1 and s == 1 and d == 0 and i == 0


def test_edit_distance_deletion_insertion():
    e, s, d, i = edit_distance_words("a b c d".split(), "a c".split())
    assert e == 2 and d == 2
    e, s, d, i = edit_distance_words("a c".split(), "a b c d".split())
    assert e == 2 and i == 2


def test_edit_distance_empty_hyp():
    e, s, d, i = edit_distance_words("a b".split(), [])
    assert e == 2 and d == 2


def test_normalize_text():
    assert normalize_text("Hello, World!  it's ME.") == \
        ["hello", "world", "it", "s", "me"]


def test_load_wav_roundtrip(tmp_path):
    path = tmp_path / "t.wav"
    rng = np.random.default_rng(0)
    pcm = rng.integers(-3000, 3000, 1600, dtype=np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    samples = load_wav(str(path))
    np.testing.assert_allclose(samples, pcm.astype(np.float32) / 32768.0)


def test_load_wav_stereo_downmix(tmp_path):
    path = tmp_path / "s.wav"
    left = np.full(100, 1000, np.int16)
    right = np.full(100, 3000, np.int16)
    inter = np.empty(200, np.int16)
    inter[0::2] = left
    inter[1::2] = right
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(inter.tobytes())
    samples = load_wav(str(path))
    assert samples.shape == (100,)
    np.testing.assert_allclose(samples, 2000.0 / 32768.0)
