"""Offline transcription CLI (tools/transcribe.py): WAV in, text out,
no server — drives the same AsrPipeline surface the server uses."""

import json
import os
import sys
import wave

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import transcribe  # noqa: E402


def _write_wav(path, samples_f32, channels=1):
    pcm = (np.clip(samples_f32, -1, 1) * 32767).astype("<i2")
    if channels == 2:
        pcm = np.stack([pcm, pcm], axis=1)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())


def test_load_wav_mono_and_stereo(tmp_path):
    sig = 0.25 * np.sin(np.linspace(0, 100, 1600)).astype(np.float32)
    _write_wav(tmp_path / "m.wav", sig)
    _write_wav(tmp_path / "s.wav", sig, channels=2)
    mono = transcribe.load_wav(str(tmp_path / "m.wav"))
    stereo = transcribe.load_wav(str(tmp_path / "s.wav"))
    assert mono.dtype == np.float32 and mono.shape == (1600,)
    np.testing.assert_allclose(mono, stereo, atol=1e-4)
    np.testing.assert_allclose(mono, sig, atol=1e-3)


def test_load_wav_rejects_wrong_rate(tmp_path):
    with wave.open(str(tmp_path / "x.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 100)
    with pytest.raises(ValueError, match="16 kHz"):
        transcribe.load_wav(str(tmp_path / "x.wav"))


@pytest.mark.slow
def test_cli_end_to_end_tiny(tmp_path, capsys):
    """Full CLI run on the tiny preset: JSON line per file, error path
    exits nonzero but still processes the good file."""
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    _write_wav(tmp_path / "ok.wav", sig)
    (tmp_path / "bad.wav").write_bytes(b"not a wav")

    rc = transcribe.main([
        str(tmp_path / "ok.wav"), str(tmp_path / "bad.wav"),
        "--preset", "tiny", "--backend", "cpu",
        "--compute-dtype", "float32",
        "--vocab", "model-repo/tiny-digits-vocab.txt", "--json"])
    assert rc == 1  # bad.wav failed
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["file"].endswith("ok.wav")
    assert isinstance(rec["transcription"], str)
    assert rec["audio_seconds"] == 0.5
    assert all(isinstance(t, int) for t in rec["tokens"])
