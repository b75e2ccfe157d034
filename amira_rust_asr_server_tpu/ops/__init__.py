"""Device compute ops: feature extraction, RNN-T decoding, losses, kernels.

Device-side replacement for the reference's host SIMD library
(ref: src/asr/simd.rs — softmax/GEMM/transpose/argmax all become XLA/MXU
work here) and for its three Triton-delegated model calls.
"""

from .features import log_mel_features
from .mel import mel_filterbank, num_frames, windowed_dft_basis

__all__ = [
    "log_mel_features", "mel_filterbank", "windowed_dft_basis", "num_frames",
]
