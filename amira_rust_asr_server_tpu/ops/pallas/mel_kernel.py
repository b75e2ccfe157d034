"""Fused log-mel spectrogram Pallas kernel.

BASELINE config #2: "Log-mel preprocessor as standalone Pallas
FFT/filterbank kernel". One kernel fuses, per block of 256 frames:

    hop-aligned framing (4 row-slices, no gather)
      -> windowed-DFT matmul on the MXU  [256,640] x [640,768]
      -> power spectrum (VPU)
      -> mel filterbank matmul           [256,384] x [384,128]
      -> log (VPU)

The waveform is viewed as hop-rows [B, N/hop, hop]; each grid step DMAs
its (overlapping) row-slice into VMEM explicitly — overlapping blocks are
exactly what BlockSpec index maps can't express, hence the manual async
copy. All matmul dims are lane-aligned (640 = 5x128, 768 = 6x128,
384 = 3x128, 128 mels).

Numerical contract: identical math to ops.features.log_mel_features up to
f32 association order (tested to ~1e-4 absolute in log space).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import (HOP_LENGTH, LOG_GUARD, N_FFT, N_MELS, PREEMPHASIS,
                          WIN_LENGTH)
from ..mel import hop_dft_basis_padded, mel_filterbank_padded

FRAMES_PER_BLOCK = 256
LANE_PAD = 384  # padded frequency lanes (257 -> 3x128)
ROW_PAD = 256   # hop rows lane-padded 160 -> 2x128


def _mel_block_kernel(x_hbm, basis_ref, fb_ref, out_ref, scratch, sem):
    """One (batch row, frame block): DMA rows -> DFT -> power -> mel."""
    b = pl.program_id(0)
    blk = pl.program_id(1)
    tb = FRAMES_PER_BLOCK

    # copy tb+8 rows (sublane-aligned; only tb+3 are consumed)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(blk * tb, tb + 8), :], scratch, sem)
    dma.start()
    dma.wait()

    # frame t = hop-rows t..t+3 (window zero-padded to 4*hop). Mosaic can't
    # concatenate row-shifted slices, so the DFT matmul is decomposed into
    # 4 shifted [TB, ROW_PAD] x [ROW_PAD, 2P] matmuls summed — same FLOPs,
    # every dimension tile-aligned (rows lane-padded 160->256 with matching
    # zero basis rows).
    rows = scratch[:]
    spec = jnp.zeros((tb, 2 * LANE_PAD), jnp.float32)
    for j in range(4):
        # sublane-offset slices miscompile in Mosaic; roll to offset 0
        # (supported relayout; shift must be positive) then take the
        # aligned [0:tb] slice
        shifted = pltpu.roll(rows, rows.shape[0] - j, 0) if j else rows
        spec += jnp.dot(shifted[:tb, :], basis_ref[j],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # [TB, 2*P]
    real = spec[:, :LANE_PAD]
    imag = spec[:, LANE_PAD:]
    power = real * real + imag * imag                      # [TB, P]

    mel = jnp.dot(power, fb_ref[:],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)     # [TB, n_mels]
    out_ref[0] = jnp.log(mel + LOG_GUARD)


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def log_mel_pallas(x_rows: jax.Array, n_mels: int = N_MELS,
                   interpret: bool = False) -> jax.Array:
    """Raw fused log-mel over hop-row-major signal [B, rows, ROW_PAD].

    ``rows`` must be >= ceil(T/256)*256 + 8. Returns unnormalized
    [B, n_blocks*256, n_mels]; the caller slices to the true frame count
    and applies masked normalization.
    """
    b, n_rows, row_pad = x_rows.shape
    assert row_pad == ROW_PAD
    tb = FRAMES_PER_BLOCK
    n_blocks = (n_rows - 8) // tb
    basis = jnp.asarray(hop_dft_basis_padded(N_FFT, WIN_LENGTH, HOP_LENGTH,
                                             LANE_PAD, ROW_PAD))
    fb = jnp.asarray(mel_filterbank_padded(n_mels, N_FFT, LANE_PAD))

    return pl.pallas_call(
        _mel_block_kernel,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # waveform rows stay in HBM
            pl.BlockSpec((4, ROW_PAD, 2 * LANE_PAD),
                         lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE_PAD, n_mels),
                         lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, n_mels), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_blocks * tb, n_mels),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tb + 8, ROW_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_rows, basis, fb)


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

    # hop-row layout, extended so the last block's DMA stays in bounds
    tb = FRAMES_PER_BLOCK
    n_blocks = -(-t_frames // tb)
    need_rows = n_blocks * tb + 8
    need = need_rows * hop
    if x.shape[1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    else:
        x = x[:, :need]
    x_rows = x.reshape(b, need_rows, hop)
    # lane-pad each hop row 160 -> ROW_PAD (basis has matching zero rows)
    x_rows = jnp.pad(x_rows, ((0, 0), (0, 0), (0, ROW_PAD - hop)))

    log_mel = log_mel_pallas(x_rows, n_mels=n_mels,
                             interpret=interpret)[:, :t_frames]  # [B,T,M]

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
