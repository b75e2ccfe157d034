"""synthspeech grammar: determinism, acoustic-code uniqueness, manifest
format, and training-batch shapes (the data side of the trained-flagship
benchmark path; model training itself is tools/train_synth.py)."""

import json

import numpy as np
import pytest

from amira_rust_asr_server_tpu.testing.synthspeech import (
    FIRST_ID, LAST_ID, _tone_freqs, random_token_ids, synth_token_ids,
    synthspeech_batches, write_manifest)
from amira_rust_asr_server_tpu.vocab import Vocabulary


def test_tone_code_unique_and_banded():
    seen = set()
    for tok in range(FIRST_ID, LAST_ID + 1):
        f1, f2 = _tone_freqs(tok)
        assert 200 <= f1 <= 1550 and 1650 <= f2 <= 6900
        key = (round(f1, 3), round(f2, 3))
        assert key not in seen
        seen.add(key)


def test_synth_deterministic_without_rng():
    a = synth_token_ids([5, 900, 42], noise=0.0)
    b = synth_token_ids([5, 900, 42], noise=0.0)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.float32 and np.abs(a).max() <= 1.0


def test_rate_scales_duration():
    slow = synth_token_ids([10, 20], rate=0.8)
    fast = synth_token_ids([10, 20], rate=1.3)
    assert len(slow) > len(fast)


def test_unrenderable_ids_skipped():
    only_specials = synth_token_ids([0, 1024], noise=0.0)
    with_tok = synth_token_ids([0, 7, 1024], noise=0.0)
    assert len(with_tok) > len(only_specials)


def test_random_token_ids_in_range():
    rng = np.random.default_rng(0)
    for _ in range(20):
        ids = random_token_ids(rng, 4, 18)
        assert 4 <= len(ids) <= 18
        assert all(FIRST_ID <= i <= LAST_ID for i in ids)


def test_batches_shapes():
    gen = synthspeech_batches(3, audio_bucket=48000, label_bucket=24,
                              seed=1, max_len=10)
    batch = next(gen)
    assert batch.audio.shape == (3, 48000)
    assert batch.labels.shape == (3, 24)
    assert (np.asarray(batch.label_lens) >= 4).all()
    assert (np.asarray(batch.audio_lens) > 0).all()
    labs = np.asarray(batch.labels)
    lens = np.asarray(batch.label_lens)
    for i in range(3):
        assert (labs[i, :lens[i]] >= FIRST_ID).all()
        assert (labs[i, :lens[i]] <= LAST_ID).all()


def test_manifest_roundtrip(tmp_path):
    vocab = Vocabulary.load("model-repo/vocab.txt")
    manifest = write_manifest(tmp_path, vocab, n_utts=3, seed=9)
    lines = [json.loads(ln) for ln in open(manifest)]
    assert len(lines) == 3
    import wave
    for e in lines:
        assert e["text"] == vocab.decode_tokens(e["token_ids"])
        with wave.open(e["audio_filepath"], "rb") as w:
            assert w.getframerate() == 16000
            assert w.getnframes() > 16000  # >= 1 s of audio
    # deterministic re-generation
    manifest2 = write_manifest(tmp_path / "again", vocab, n_utts=3, seed=9)
    lines2 = [json.loads(ln) for ln in open(manifest2)]
    assert [e["token_ids"] for e in lines] == \
        [e["token_ids"] for e in lines2]
