"""Validate + time the native C++ host kernels against NumPy oracles.

Analogue of the reference's validate_optimizations / simd_performance_test
bins (ref: src/bin/validate_optimizations.rs) — every native kernel must
agree with its oracle, and the speedup is reported.

    python tools/validate_native_kernels.py
"""

from __future__ import annotations

import pathlib
import sys as _sys

_sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import time

import numpy as np

from amira_rust_asr_server_tpu.audio import native


def timeit(fn, *args, iters=50):
    fn(*args)  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn(*args)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    rng = np.random.default_rng(0)
    n = 16000 * 30  # 30 s of audio
    pcm = rng.integers(-32768, 32768, n, dtype=np.int16).tobytes()
    samples = (rng.standard_normal(n) * 0.2).astype(np.float32)

    native._load()
    print(f"native library loaded: {native.HAVE_NATIVE}")

    # -- PCM conversion ----------------------------------------------------
    got = native.pcm16_bytes_to_f32(pcm)
    want = np.frombuffer(pcm, "<i2").astype(np.float32) / 32768.0
    assert np.array_equal(got, want), "pcm16 -> f32 mismatch"
    t_native = timeit(native.pcm16_bytes_to_f32, pcm)
    t_numpy = timeit(
        lambda b: np.frombuffer(b, "<i2").astype(np.float32) / 32768.0, pcm)
    print(f"pcm16->f32 30s: native {t_native*1e3:.3f} ms, "
          f"numpy {t_numpy*1e3:.3f} ms ({t_numpy/t_native:.1f}x)")

    # -- mean amplitude ----------------------------------------------------
    got = native.mean_amplitude(samples)
    want = float(np.mean(np.abs(samples)))
    assert abs(got - want) < 1e-4, f"mean amplitude {got} vs {want}"
    t_native = timeit(native.mean_amplitude, samples)
    t_numpy = timeit(lambda x: float(np.mean(np.abs(x))), samples)
    print(f"mean_amplitude: native {t_native*1e3:.3f} ms, "
          f"numpy {t_numpy*1e3:.3f} ms ({t_numpy/t_native:.1f}x)")

    # -- peak window energy ------------------------------------------------
    got = native.peak_window_energy(samples, 800)
    sq = samples.astype(np.float64) ** 2
    csum = np.concatenate([[0.0], np.cumsum(sq)])
    sums = csum[800:] - csum[:-800]
    want = float(np.sqrt(sums.max() / 800))
    assert abs(got - want) < 1e-4, f"peak energy {got} vs {want}"
    t_native = timeit(native.peak_window_energy, samples, 800)
    print(f"peak_window_energy: native {t_native*1e3:.3f} ms")

    print("all native kernels validated")


if __name__ == "__main__":
    main()
