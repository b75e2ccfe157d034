// Host-side audio kernels for the TPU ASR front-end.
//
// Native-performance equivalent of the reference's SIMD kernel library
// (ref: src/asr/simd.rs — bytes_to_f32 :85-246, mean amplitude :176-268,
// ring-buffer memcpy src/asr/audio.rs:300-487). Instead of hand-written
// AVX2/AVX-512 intrinsics with runtime dispatch, these are tight scalar
// loops compiled with -O3 -march=native: the compiler autovectorizes the
// i16->f32 widening and the reductions to the best ISA available, which is
// the idiomatic way to get the same machine code without the 1.4k-line
// intrinsics matrix. Exposed over a C ABI for ctypes.
//
// Everything device-side from simd.rs (softmax, GEMM, transpose, argmax over
// logits) intentionally has NO host equivalent here: those run on the TPU
// inside the XLA program (see amira_rust_asr_server_tpu/ops/).

#include <cstddef>
#include <cstdint>
#include <cmath>
#include <cstring>

extern "C" {

// i16 little-endian PCM -> f32 in [-1, 1), scale 1/32768
// (ref: src/asr/audio.rs:18-26, src/performance_opts.rs bytes_to_f32_optimized)
void pcm16le_to_f32(const int16_t* in, float* out, size_t n) {
  const float scale = 1.0f / 32768.0f;
  for (size_t i = 0; i < n; ++i) {
    out[i] = static_cast<float>(in[i]) * scale;
  }
}

// f32 -> i16 PCM with clamping (round-trip utility for tests/clients).
void f32_to_pcm16le(const float* in, int16_t* out, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    float v = in[i] * 32768.0f;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    out[i] = static_cast<int16_t>(v);
  }
}

// Mean absolute amplitude (ref: simd.rs:176-268 mean_amplitude).
float mean_amplitude(const float* in, size_t n) {
  if (n == 0) return 0.0f;
  // 8 independent accumulators: a single double accumulator is a serial
  // FP dependency chain that strict FP ordering forbids the compiler to
  // vectorize (measured 0.7x numpy); independent lanes let -O3 use the
  // full SIMD width
  double acc[8] = {0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0};
  size_t i = 0;
  for (; i + 8 <= n; i += 8) {
    for (int k = 0; k < 8; ++k) {
      acc[k] += std::fabs(static_cast<double>(in[i + k]));
    }
  }
  double total = 0.0;
  for (int k = 0; k < 8; ++k) total += acc[k];
  for (; i < n; ++i) total += std::fabs(static_cast<double>(in[i]));
  return static_cast<float>(total / static_cast<double>(n));
}

// Peak smoothed energy: max over sliding windows of mean(x^2), returns
// sqrt of the max — the silence-detection statistic
// (ref: src/asr/weaving.rs:288-313 is_overlap_silence). O(n) running sum
// instead of the reference's O(n*w) rescan.
float peak_window_energy(const float* in, size_t n, size_t window) {
  if (n == 0) return 0.0f;
  if (window > n) window = n;
  if (window == 0) window = 1;
  double sum = 0.0;
  for (size_t i = 0; i < window; ++i) {
    sum += static_cast<double>(in[i]) * static_cast<double>(in[i]);
  }
  double max_sum = sum;
  for (size_t i = window; i < n; ++i) {
    sum += static_cast<double>(in[i]) * static_cast<double>(in[i]);
    sum -= static_cast<double>(in[i - window]) * static_cast<double>(in[i - window]);
    if (sum > max_sum) max_sum = sum;
  }
  double avg = max_sum / static_cast<double>(window);
  return static_cast<float>(std::sqrt(avg < 0.0 ? 0.0 : avg));
}

// Ring-buffer wraparound copy helpers (ref: audio.rs:364-385 unsafe memcpy):
// copy `n` bytes out of a circular buffer of size `cap` starting at `start`.
void ring_read(const uint8_t* buf, size_t cap, size_t start, uint8_t* out,
               size_t n) {
  size_t first = cap - start;
  if (first > n) first = n;
  std::memcpy(out, buf + start, first);
  if (n > first) {
    std::memcpy(out + first, buf, n - first);
  }
}

void ring_write(uint8_t* buf, size_t cap, size_t start, const uint8_t* in,
                size_t n) {
  size_t first = cap - start;
  if (first > n) first = n;
  std::memcpy(buf + start, in, first);
  if (n > first) {
    std::memcpy(buf, in + first, n - first);
  }
}

}  // extern "C"
