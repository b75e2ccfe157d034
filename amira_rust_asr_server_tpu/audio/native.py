"""ctypes bindings to the native host audio kernels (csrc/audio_kernels.cc).

The shared library is built lazily on first import with g++ (cached as
csrc/libasr_audio.so). Every entry point has a NumPy fallback so the
framework works without a toolchain; :data:`HAVE_NATIVE` reports which path
is active. This is the TPU-stack analogue of the reference's runtime SIMD
dispatch (ref: src/asr/simd.rs:85-246 detect AVX2/AVX-512 vs scalar).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "libasr_audio.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
HAVE_NATIVE = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", str(_CSRC)],
            check=True, capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, HAVE_NATIVE
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists() and os.environ.get("ASR_NO_NATIVE") != "1":
            _build()
        if _LIB_PATH.exists() and os.environ.get("ASR_NO_NATIVE") != "1":
            try:
                lib = ctypes.CDLL(str(_LIB_PATH))
            except OSError:
                return None
            lib.pcm16le_to_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
            lib.f32_to_pcm16le.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
            lib.mean_amplitude.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
            lib.mean_amplitude.restype = ctypes.c_float
            lib.peak_window_energy.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t]
            lib.peak_window_energy.restype = ctypes.c_float
            _lib = lib
            HAVE_NATIVE = True
        return _lib


def pcm16_bytes_to_f32(data: bytes | bytearray | memoryview) -> np.ndarray:
    """i16LE PCM bytes -> float32 samples scaled by 1/32768.

    ref behavior: src/asr/audio.rs:18-26 (bytes_to_f32_samples).
    Odd trailing byte is an error for the caller to catch upstream; here we
    require an even length.
    """
    if len(data) % 2 != 0:
        raise ValueError("PCM16 byte length must be even")
    raw = np.frombuffer(data, dtype="<i2")
    out = np.empty(raw.shape[0], dtype=np.float32)
    lib = _load()
    if lib is not None and raw.size:
        raw = np.ascontiguousarray(raw)
        lib.pcm16le_to_f32(
            raw.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p), raw.size)
    else:
        np.multiply(raw.astype(np.float32), np.float32(1.0 / 32768.0), out=out)
    return out


def f32_to_pcm16_bytes(samples: np.ndarray) -> bytes:
    """float32 samples -> i16LE PCM bytes with clamping."""
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    out = np.empty(samples.shape[0], dtype="<i2")
    lib = _load()
    if lib is not None and samples.size:
        lib.f32_to_pcm16le(
            samples.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p), samples.size)
    else:
        clipped = np.clip(samples * 32768.0, -32768.0, 32767.0)
        out[:] = clipped.astype(np.int16)
    return out.tobytes()


def mean_amplitude(samples: np.ndarray) -> float:
    """Mean absolute amplitude (ref: src/asr/audio.rs:50-60)."""
    if samples.size == 0:
        return 0.0
    lib = _load()
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    if lib is not None:
        return float(lib.mean_amplitude(
            samples.ctypes.data_as(ctypes.c_void_p), samples.size))
    return float(np.mean(np.abs(samples)))


def peak_window_energy(samples: np.ndarray, window: int = 800) -> float:
    """sqrt(max sliding-window mean power) — silence statistic.

    ref behavior: src/asr/weaving.rs:288-313 (is_overlap_silence inner loop),
    reimplemented O(n) with a running sum.
    """
    if samples.size == 0:
        return 0.0
    lib = _load()
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    if lib is not None:
        return float(lib.peak_window_energy(
            samples.ctypes.data_as(ctypes.c_void_p), samples.size,
            min(window, samples.size)))
    sq = samples.astype(np.float64) ** 2
    w = max(1, min(window, sq.size))
    csum = np.concatenate([[0.0], np.cumsum(sq)])
    sums = csum[w:] - csum[:-w]
    return float(np.sqrt(sums.max() / w))
