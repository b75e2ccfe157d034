"""Preprocessor tests: conv-DFT log-mel vs independent np.fft oracle
(ref contract: model-repo/preprocessor/config.pbtxt [B,128,T])."""

import numpy as np
import pytest

from amira_rust_asr_server_tpu.constants import (HOP_LENGTH, N_MELS,
                                                 SAMPLE_RATE)
from amira_rust_asr_server_tpu.ops import (log_mel_features, mel_filterbank,
                                           num_frames)
from amira_rust_asr_server_tpu.ops.features import log_mel_oracle


def test_mel_filterbank_shape_and_properties():
    fb = mel_filterbank()
    assert fb.shape == (257, N_MELS)
    assert (fb >= 0).all()
    # every filter has some support
    assert (fb.sum(axis=0) > 0).all()
    # filters are ordered by center frequency
    centers = fb.argmax(axis=0)
    assert (np.diff(centers) >= 0).all()


def test_log_mel_matches_fft_oracle(rng):
    n = SAMPLE_RATE  # 1 second
    wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
    # tone + noise for realistic dynamic range
    t = np.arange(n) / SAMPLE_RATE
    wave += 0.5 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

    feats, lens = log_mel_features(wave[None, :], np.array([n]))
    feats = np.asarray(feats)[0]  # [n_mels, T]
    assert int(lens[0]) == num_frames(n)
    oracle = log_mel_oracle(wave)  # unnormalized [n_mels, T]
    assert feats.shape == oracle.shape

    # normalize oracle per feature the same way and compare
    mean = oracle.mean(axis=1, keepdims=True)
    std = oracle.std(axis=1, ddof=1, keepdims=True) + 1e-5
    oracle_norm = (oracle - mean) / std
    np.testing.assert_allclose(feats, oracle_norm, atol=2e-2, rtol=1e-3)


def test_log_mel_batch_padding_invariance(rng):
    """A sequence's features must not change when batch-padded longer."""
    n1, n2 = 8000, 16000
    w1 = (rng.standard_normal(n1) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal(n2) * 0.1).astype(np.float32)

    f_solo, l_solo = log_mel_features(w1[None, :], np.array([n1]))
    batch = np.zeros((2, n2), np.float32)
    batch[0, :n1] = w1
    batch[1] = w2
    f_batch, l_batch = log_mel_features(batch, np.array([n1, n2]))

    t1 = int(l_solo[0])
    assert int(l_batch[0]) == t1
    np.testing.assert_allclose(
        np.asarray(f_batch)[0, :, :t1], np.asarray(f_solo)[0, :, :t1],
        atol=1e-4, rtol=1e-4)
    # frames past the valid length are zeroed
    assert np.abs(np.asarray(f_batch)[0, :, t1:]).max() == 0.0


def test_feature_lens_formula():
    for n in [160, 1600, 16000, 15999, 16001]:
        w = np.zeros((1, ((n + 159) // 160) * 160 + 160), np.float32)
        _, lens = log_mel_features(w, np.array([n]))
        assert int(lens[0]) == 1 + n // HOP_LENGTH


def test_normalization_zero_mean_unit_std(rng):
    n = 32000
    w = (rng.standard_normal(n) * 0.3).astype(np.float32)
    feats, lens = log_mel_features(w[None, :], np.array([n]))
    f = np.asarray(feats)[0, :, :int(lens[0])]
    assert np.abs(f.mean(axis=1)).max() < 1e-3
    assert np.abs(f.std(axis=1, ddof=1) - 1.0).max() < 1e-2
