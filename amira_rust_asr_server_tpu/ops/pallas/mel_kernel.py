"""Fused log-mel spectrogram Pallas kernel (phase-major framing).

BASELINE config #2: "Log-mel preprocessor as standalone Pallas
FFT/filterbank kernel". One kernel fuses, per block of 256 frames:

    windowed-DFT matmul on the MXU  [256, 640] x [640, 768]
      -> power spectrum (VPU)
      -> mel filterbank matmul      [256, 384] x [384, 128]
      -> log (VPU)

Framing insight: with hop=160, frames t = p (mod 4) start exactly 640
apart, so splitting frames by phase p in 0..3 turns framing into a PURE
RESHAPE of the (shifted) padded waveform to rows of 640 = 5x128 — every
matmul dimension is lane-aligned with zero padding waste and the STFT is
a single matmul. (The previous hop-row decomposition summed 4 shifted
[256, 256-pad] x [256-pad, 768] matmuls: ~6x the f32 FLOPs from sublane/
lane padding — measured 7.9 ms of a 40 ms flagship batch. This layout
does the same math in ~53 GFLOP for B=16 x 30 s.)

Numerical contract: identical math to ops.features.log_mel_features up to
f32 association order (tested to ~1e-4 absolute in log space; the DFT
matmul carries precision=HIGHEST).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import (HOP_LENGTH, LOG_GUARD, N_FFT, N_MELS, PREEMPHASIS,
                          WIN_LENGTH)
from ..mel import frame_dft_basis_padded, mel_filterbank_padded

FRAMES_PER_BLOCK = 256
LANE_PAD = 384            # padded frequency lanes (257 -> 3x128)
FRAME_LEN = 4 * HOP_LENGTH  # 640 = 5x128: phase-major frame rows


def _mel_block_kernel(x_ref, basis_ref, fb_ref, out_ref):
    """One (batch, phase, frame-block): DFT matmul -> power -> mel -> log."""
    frames = x_ref[0, 0]                                   # [TB, 640] f32
    spec = jnp.dot(frames, basis_ref[:],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)    # [TB, 2*P]
    real = spec[:, :LANE_PAD]
    imag = spec[:, LANE_PAD:]
    power = real * real + imag * imag
    mel = jnp.dot(power, fb_ref[:],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)     # [TB, n_mels]
    out_ref[0, 0] = jnp.log(mel + LOG_GUARD)


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def log_mel_pallas(x_phases: jax.Array, n_mels: int = N_MELS,
                   interpret: bool = False) -> jax.Array:
    """Raw fused log-mel over phase-major frame rows.

    ``x_phases``: [B, 4, R, FRAME_LEN] f32 where row (b, p, r) holds the
    640 samples starting at padded-waveform offset p*hop + r*640 (frame
    t = 4r + p); R must be a multiple of FRAMES_PER_BLOCK. Returns
    unnormalized [B, 4, R, n_mels]; the caller interleaves phases back to
    frame order and applies masked normalization.
    """
    b, n_phase, r, fl = x_phases.shape
    assert n_phase == 4 and fl == FRAME_LEN and r % FRAMES_PER_BLOCK == 0
    tb = FRAMES_PER_BLOCK
    basis = jnp.asarray(frame_dft_basis_padded(N_FFT, WIN_LENGTH, FRAME_LEN,
                                               LANE_PAD))
    fb = jnp.asarray(mel_filterbank_padded(n_mels, N_FFT, LANE_PAD))

    return pl.pallas_call(
        _mel_block_kernel,
        grid=(b, 4, r // tb),
        in_specs=[
            pl.BlockSpec((1, 1, tb, FRAME_LEN), lambda i, p, j: (i, p, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # basis resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # filterbank resident
        ],
        out_specs=pl.BlockSpec((1, 1, tb, n_mels),
                               lambda i, p, j: (i, p, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 4, r, n_mels), jnp.float32),
        interpret=interpret,
    )(x_phases, basis, fb)


def log_mel_features_pallas(waveforms: jax.Array, waveforms_lens: jax.Array,
                            n_mels: int = N_MELS,
                            interpret: bool = False):
    """Drop-in replacement for ops.features.log_mel_features backed by the
    fused Pallas kernel. Same contract: [B, N] + lens ->
    ([B, n_mels, T], [B] int32)."""
    b, n = waveforms.shape
    hop = HOP_LENGTH
    t_frames = 1 + n // hop

    sample_valid = jnp.arange(n)[None, :] < waveforms_lens[:, None]
    x = jnp.where(sample_valid, waveforms, 0.0)
    x = jnp.concatenate([x[:, :1], x[:, 1:] - PREEMPHASIS * x[:, :-1]],
                        axis=1)
    x = jnp.where(sample_valid, x, 0.0)

    pad = N_FFT // 2
    x = jnp.pad(x, ((0, 0), (pad, 0)), mode="reflect")
    x = jnp.pad(x, ((0, 0), (0, pad)), mode="constant")

    # phase-major frame rows: R rows of 640 per phase, R a block multiple
    tb = FRAMES_PER_BLOCK
    r_min = -(-t_frames // 4)            # ceil(T/4) rows per phase
    r_rows = -(-r_min // tb) * tb        # rounded up to a block multiple
    need = 3 * hop + r_rows * FRAME_LEN
    if x.shape[1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    phases = jnp.stack(
        [x[:, p * hop:p * hop + r_rows * FRAME_LEN]
         .reshape(b, r_rows, FRAME_LEN) for p in range(4)], axis=1)

    mel_pm = log_mel_pallas(phases, n_mels=n_mels,
                            interpret=interpret)       # [B, 4, R, M]
    log_mel = mel_pm.transpose(0, 2, 1, 3).reshape(
        b, 4 * r_rows, n_mels)[:, :t_frames]           # [B, T, M]

    feat_lens = (1 + waveforms_lens // hop).astype(jnp.int32)
    valid = jnp.arange(t_frames)[None, :] < feat_lens[:, None]
    denom = jnp.maximum(feat_lens.astype(jnp.float32), 1.0)[:, None]
    masked = jnp.where(valid[:, :, None], log_mel, 0.0)
    mean = jnp.sum(masked, axis=1) / denom
    sq = jnp.where(valid[:, :, None], (log_mel - mean[:, None, :]) ** 2, 0.0)
    var = jnp.sum(sq, axis=1) / jnp.maximum(denom - 1.0, 1.0)
    std = jnp.sqrt(var) + 1e-5
    normed = (log_mel - mean[:, None, :]) / std[:, None, :]
    normed = jnp.where(valid[:, :, None], normed, 0.0)
    return jnp.transpose(normed, (0, 2, 1)), feat_lens
