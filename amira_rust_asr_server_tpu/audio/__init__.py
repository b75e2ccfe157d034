"""Host-side audio subsystem: PCM conversion, ring buffer, windowing.

Device-side feature extraction (STFT/mel) lives in ``ops/``; this package is
the host front-end path (ref: src/asr/audio.rs + the host half of
src/asr/simd.rs).
"""

from .buffer import AudioRingBuffer, OverlappingAudioBuffer, window_sequence
from .native import (HAVE_NATIVE, f32_to_pcm16_bytes, mean_amplitude,
                     pcm16_bytes_to_f32, peak_window_energy)

__all__ = [
    "AudioRingBuffer", "OverlappingAudioBuffer", "window_sequence",
    "pcm16_bytes_to_f32", "f32_to_pcm16_bytes", "mean_amplitude",
    "peak_window_energy", "HAVE_NATIVE",
]


def audio_len_seconds(samples) -> float:
    """Audio length in seconds (ref: src/asr/audio.rs:44-48)."""
    from ..constants import SAMPLE_RATE
    return len(samples) / float(SAMPLE_RATE)
