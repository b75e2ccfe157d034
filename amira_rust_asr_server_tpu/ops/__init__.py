"""Device compute ops: feature extraction, RNN-T decoding, losses, kernels.

Device-side replacement for the reference's host SIMD library
(ref: src/asr/simd.rs — softmax/GEMM/transpose/argmax all become XLA/MXU
work here) and for its three Triton-delegated model calls.
"""

from .beam import (BeamResult, TokenTrie, beam_decode,
                   beam_decode_transducer,
                   make_bias_vector)
from .ctc import ctc_greedy_decode, ctc_loss
from .ctc_beam import CtcBeamResult, ctc_beam_decode
from .features import log_mel_features
from .greedy import GreedyResult, greedy_decode, greedy_decode_transducer
from .mel import mel_filterbank, num_frames, windowed_dft_basis
from .rnnt_loss import rnnt_loss, transducer_loss
from .streaming import EncoderCache, encode_chunk, init_encoder_cache

__all__ = [
    "log_mel_features", "mel_filterbank", "windowed_dft_basis", "num_frames",
    "greedy_decode", "greedy_decode_transducer", "GreedyResult",
    "beam_decode", "beam_decode_transducer", "BeamResult",
    "TokenTrie",
    "make_bias_vector", "rnnt_loss", "transducer_loss",
    "ctc_loss", "ctc_greedy_decode",
    "ctc_beam_decode", "CtcBeamResult",
    "encode_chunk", "init_encoder_cache", "EncoderCache",
]
