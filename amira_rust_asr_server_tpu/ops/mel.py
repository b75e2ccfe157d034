"""Mel filterbank + windowed-DFT basis construction (host-side, NumPy f64).

These constants parameterize the on-device preprocessor in
:mod:`.features`. The filterbank follows the slaney-style mel scale
(linear below 1 kHz, log above; filters normalized to constant area) that
the reference's ONNX preprocessor contract implies (NeMo featurizer
defaults; ref contract: model-repo/preprocessor/config.pbtxt [B,128,T]).

Everything is computed in float64 once at startup and cast to float32,
so the device program only ever sees constant matrices.
"""

from __future__ import annotations

import functools

import numpy as np

from ..constants import HOP_LENGTH, MEL_FMAX, MEL_FMIN, N_FFT, N_MELS, SAMPLE_RATE, WIN_LENGTH


def hz_to_mel(freq: np.ndarray | float) -> np.ndarray:
    """Slaney mel scale: linear < 1 kHz, logarithmic above."""
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels)
    return mels


def mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(n_mels: int = N_MELS, n_fft: int = N_FFT,
                   sample_rate: int = SAMPLE_RATE, fmin: float = MEL_FMIN,
                   fmax: float = MEL_FMAX) -> np.ndarray:
    """[n_freqs, n_mels] triangular filterbank, slaney-normalized."""
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fb = np.zeros((n_freqs, n_mels), dtype=np.float64)
    for m in range(n_mels):
        left, center, right = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - left) / max(center - left, 1e-10)
        down = (right - fft_freqs) / max(right - center, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
        # slaney area normalization
        fb[:, m] *= 2.0 / (right - left)
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def windowed_dft_basis(n_fft: int = N_FFT, win_length: int = WIN_LENGTH
                       ) -> np.ndarray:
    """Windowed DFT basis [n_fft, 2*n_freqs].

    The STFT becomes ONE matmul on the MXU: the Hann window is folded into
    the real/imag DFT columns, so ``frames @ basis`` yields concatenated
    (real, imag) channels. This replaces a host FFT with pure matmul work —
    the TPU-native formulation of the reference's preprocessor ONNX graph.
    """
    n_freqs = n_fft // 2 + 1
    # periodic Hann of win_length, centered in the n_fft frame (NeMo pads
    # the window symmetrically when win_length < n_fft).
    window = np.zeros(n_fft, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    offset = (n_fft - win_length) // 2
    window[offset:offset + win_length] = hann

    n = np.arange(n_fft)[:, None]          # [n_fft, 1]
    k = np.arange(n_freqs)[None, :]        # [1, n_freqs]
    angle = -2.0 * np.pi * n * k / n_fft
    real = np.cos(angle) * window[:, None]
    imag = np.sin(angle) * window[:, None]
    basis = np.concatenate([real, imag], axis=1)  # [n_fft, 2*n_freqs]
    return basis.astype(np.float32)


def num_frames(n_samples: int, hop_length: int = HOP_LENGTH) -> int:
    """Frame count with center padding: 1 + floor(N / hop)."""
    return 1 + n_samples // hop_length


@functools.lru_cache(maxsize=8)
def frame_dft_basis_padded(n_fft: int = N_FFT, win_length: int = WIN_LENGTH,
                           frame_len: int = 4 * HOP_LENGTH,
                           lane_pad: int = 384) -> np.ndarray:
    """Windowed DFT basis over full frames: [frame_len, 2*lane_pad].

    Used by the phase-major Pallas mel kernel: with hop=160, frames
    t = p (mod 4) start 640 apart, so per-phase framing is a pure reshape
    to rows of ``frame_len``=640 (= 5x128, lane-aligned, no padding waste)
    and the whole STFT is ONE [TB, 640] x [640, 768] matmul. Rows
    n_fft..frame_len and frequency columns past n_fft//2+1 are zero.
    Layout: [:, :lane_pad]=real, [:, lane_pad:]=imag.
    """
    assert n_fft <= frame_len
    base = windowed_dft_basis(n_fft, win_length)
    n_freqs = n_fft // 2 + 1
    out = np.zeros((frame_len, 2 * lane_pad), np.float32)
    out[:n_fft, :n_freqs] = base[:, :n_freqs]
    out[:n_fft, lane_pad:lane_pad + n_freqs] = base[:, n_freqs:]
    return out


@functools.lru_cache(maxsize=8)
def hop_dft_basis_padded(n_fft: int = N_FFT, win_length: int = WIN_LENGTH,
                         hop_length: int = HOP_LENGTH,
                         lane_pad: int = 384,
                         row_pad: int = 256) -> np.ndarray:
    """Windowed DFT basis in hop-row form [4, row_pad, 2*P].

    The window (512) is zero-extended to 4*hop (640) so a frame is exactly
    4 consecutive hop-rows of the signal reshaped to [N/hop, hop]; each hop
    row is lane-padded to ``row_pad`` (160 -> 256 = 2x128) and the basis
    gets matching zero rows, so the STFT becomes
    ``sum_j rows[j:j+T] @ basis[j]`` with every dimension tile-aligned.
    Frequencies are zero-padded from n_fft//2+1=257 to ``lane_pad``
    columns. Layout: [..., :P]=real, [..., P:]=imag.
    """
    assert n_fft <= 4 * hop_length
    base = windowed_dft_basis(n_fft, win_length)  # [n_fft, 2*(n_fft//2+1)]
    n_freqs = n_fft // 2 + 1
    full = np.zeros((4 * hop_length, 2 * lane_pad), np.float64)
    full[:n_fft, :n_freqs] = base[:, :n_freqs]
    full[:n_fft, lane_pad:lane_pad + n_freqs] = base[:, n_freqs:]
    out = np.zeros((4, row_pad, 2 * lane_pad), np.float32)
    for j in range(4):
        out[j, :hop_length] = full[j * hop_length:(j + 1) * hop_length]
    return out


@functools.lru_cache(maxsize=8)
def mel_filterbank_padded(n_mels: int = N_MELS, n_fft: int = N_FFT,
                          lane_pad: int = 384) -> np.ndarray:
    """[lane_pad, n_mels] filterbank with zero rows past n_fft//2+1."""
    fb = mel_filterbank(n_mels, n_fft)
    out = np.zeros((lane_pad, n_mels), np.float32)
    out[:fb.shape[0]] = fb
    return out
