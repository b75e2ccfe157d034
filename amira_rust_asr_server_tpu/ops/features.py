"""On-device log-mel feature extraction (the "preprocessor" model).

Tensor contract parity (ref: model-repo/preprocessor/config.pbtxt and
src/triton/model.rs:69-259):

    waveforms [B, N] f32, waveforms_lens [B] i32/i64
      -> features [B, n_mels, T] f32, features_lens [B] i32

TPU-first design: instead of a host FFT (or an ONNX STFT graph), the whole
featurizer is one XLA program built from MXU-friendly primitives:

  1. optional pre-emphasis (elementwise, fuses)
  2. reflect-pad, then STFT as a single strided conv against a windowed
     DFT basis (see ops/mel.windowed_dft_basis) — pure matmul work
  3. power spectrum -> mel projection as one [n_freqs, n_mels] matmul
  4. log with guard, then length-masked per-feature normalization

Everything is static-shaped; `waveforms` is padded to a bucket length by the
caller and `waveforms_lens` drives masking, so one compiled program serves a
whole bucket (no recompiles per request).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (HOP_LENGTH, LOG_GUARD, N_FFT, N_MELS, PREEMPHASIS,
                         WIN_LENGTH)
from .mel import mel_filterbank, windowed_dft_basis


@functools.partial(jax.jit, static_argnames=("n_mels", "n_fft", "hop_length",
                                             "win_length", "use_preemphasis"))
def log_mel_features(waveforms: jax.Array, waveforms_lens: jax.Array,
                     n_mels: int = N_MELS, n_fft: int = N_FFT,
                     hop_length: int = HOP_LENGTH,
                     win_length: int = WIN_LENGTH,
                     use_preemphasis: bool = True,
                     ) -> Tuple[jax.Array, jax.Array]:
    """waveforms [B, N] f32, lens [B] int -> ([B, n_mels, T], [B] int32).

    T = 1 + N // hop_length (center padding); frames beyond a sequence's
    length are zeroed after normalization, matching the zero-padded-features
    behavior the encoder contract expects.
    """
    basis = jnp.asarray(windowed_dft_basis(n_fft, win_length))
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft))
    b, n = waveforms.shape
    n_freqs = n_fft // 2 + 1

    # zero out padding samples so a sequence's features are identical no
    # matter how far the batch is padded (determinism across buckets)
    sample_valid = jnp.arange(n)[None, :] < waveforms_lens[:, None]
    x = jnp.where(sample_valid, waveforms, 0.0)
    if use_preemphasis:
        x = jnp.concatenate([x[:, :1], x[:, 1:] - PREEMPHASIS * x[:, :-1]],
                            axis=1)
        # re-mask: pre-emphasis leaks -coef*x[len-1] into position `len`,
        # which a solo (unpadded) run of the same sequence wouldn't have
        x = jnp.where(sample_valid, x, 0.0)

    # center padding so frame t is centered at t * hop: reflect at the
    # start (signal onset), zeros at the end — the end of a sequence inside
    # a padded batch is zeros regardless, so zero end-padding is the choice
    # that makes solo and batched runs bit-identical.
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, 0)), mode="reflect")
    x = jnp.pad(x, ((0, 0), (0, pad)), mode="constant")

    # STFT via hop-decomposition: the window is zero-extended to 4*hop so
    # frame t is exactly hop-rows t..t+3 of x reshaped to [rows, hop], and
    # the [T, 4h] x [4h, K] DFT matmul becomes four shifted [T, h] x [h, K]
    # matmuls summed — NO gather (a [T, n_fft] frame gather is the
    # dominant cost of the naive formulation on TPU), and no conv (XLA's
    # CPU backend compiles width-512 convs pathologically slowly).
    # precision=HIGHEST: the DFT must stay true f32 on the MXU — the
    # default bf16-input path costs ~1e-1 absolute error in log-mel space.
    t_frames = 1 + n // hop_length
    assert n_fft <= 4 * hop_length, "window must fit in 4 hops"
    basis4 = jnp.pad(basis, ((0, 4 * hop_length - n_fft), (0, 0)))
    need_rows = t_frames + 4
    total = x.shape[1]
    if total < need_rows * hop_length:
        x = jnp.pad(x, ((0, 0), (0, need_rows * hop_length - total)))
    rows = x[:, :need_rows * hop_length].reshape(b, need_rows, hop_length)
    spec = sum(
        jnp.einsum("brh,hk->brk", rows[:, j:j + t_frames],
                   basis4[j * hop_length:(j + 1) * hop_length],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        for j in range(4))                             # [B, T, 2*n_freqs]
    real, imag = spec[..., :n_freqs], spec[..., n_freqs:]
    power = real * real + imag * imag                 # [B, T, n_freqs]

    mel = jnp.einsum("btf,fm->btm", power, fb,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # [B, T, n_mels]
    log_mel = jnp.log(mel + LOG_GUARD)

    t = log_mel.shape[1]
    feat_lens = (1 + waveforms_lens // hop_length).astype(jnp.int32)
    frame_idx = jnp.arange(t)[None, :]                # [1, T]
    valid = frame_idx < feat_lens[:, None]            # [B, T]

    # per-feature normalization over valid frames (NeMo 'per_feature')
    denom = jnp.maximum(feat_lens.astype(jnp.float32), 1.0)[:, None]
    masked = jnp.where(valid[:, :, None], log_mel, 0.0)
    mean = jnp.sum(masked, axis=1) / denom            # [B, n_mels]
    sq_diff = jnp.where(valid[:, :, None],
                        (log_mel - mean[:, None, :]) ** 2, 0.0)
    # unbiased std over valid frames (guard length<=1)
    var = jnp.sum(sq_diff, axis=1) / jnp.maximum(denom - 1.0, 1.0)
    std = jnp.sqrt(var) + 1e-5
    normed = (log_mel - mean[:, None, :]) / std[:, None, :]
    normed = jnp.where(valid[:, :, None], normed, 0.0)

    return jnp.transpose(normed, (0, 2, 1)), feat_lens  # [B, n_mels, T]


def log_mel_oracle(waveform: np.ndarray, use_preemphasis: bool = True
                   ) -> np.ndarray:
    """NumPy/np.fft reference implementation for tests: [n_mels, T].

    Single-sequence, unnormalized up to the log (normalization is checked
    separately in tests). Uses an actual FFT so the conv-DFT device path is
    validated against an independent formulation.
    """
    x = waveform.astype(np.float64)
    if use_preemphasis:
        x = np.concatenate([x[:1], x[1:] - PREEMPHASIS * x[:-1]])
    pad = N_FFT // 2
    x = np.pad(np.pad(x, (pad, 0), mode="reflect"), (0, pad))
    window = np.zeros(N_FFT)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(WIN_LENGTH) / WIN_LENGTH)
    off = (N_FFT - WIN_LENGTH) // 2
    window[off:off + WIN_LENGTH] = hann
    n_frames = (len(x) - N_FFT) // HOP_LENGTH + 1
    frames = np.stack([
        x[i * HOP_LENGTH:i * HOP_LENGTH + N_FFT] * window
        for i in range(n_frames)])
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    mel = power @ mel_filterbank().astype(np.float64)
    return np.log(mel + LOG_GUARD).T  # [n_mels, T]
