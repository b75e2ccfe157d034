"""Pallas fused log-mel kernel vs the XLA reference path (interpret mode
on the CPU mesh; the real-TPU comparison runs in bench/verification)."""

import numpy as np
import pytest

from amira_rust_asr_server_tpu.constants import SAMPLE_RATE
from amira_rust_asr_server_tpu.ops import log_mel_features
from amira_rust_asr_server_tpu.ops.pallas.mel_kernel import (
    log_mel_features_pallas)


@pytest.mark.parametrize("n", [8000, 16000, 48000])
def test_pallas_matches_xla_path(rng, n):
    wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
    t = np.arange(n) / SAMPLE_RATE
    wave += 0.4 * np.sin(2 * np.pi * 523.0 * t).astype(np.float32)

    ref, ref_lens = log_mel_features(wave[None, :], np.array([n]))
    got, got_lens = log_mel_features_pallas(wave[None, :], np.array([n]),
                                            interpret=True)
    assert int(got_lens[0]) == int(ref_lens[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_pallas_ragged_batch(rng):
    n1, n2 = 6000, 16000
    w = np.zeros((2, n2), np.float32)
    w[0, :n1] = (rng.standard_normal(n1) * 0.1).astype(np.float32)
    w[1] = (rng.standard_normal(n2) * 0.1).astype(np.float32)
    lens = np.array([n1, n2])

    ref, ref_lens = log_mel_features(w, lens)
    got, got_lens = log_mel_features_pallas(w, lens, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_lens), np.asarray(ref_lens))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)
    # padding frames zeroed
    t1 = int(got_lens[0])
    assert np.abs(np.asarray(got)[0, :, t1:]).max() == 0.0
