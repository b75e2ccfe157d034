"""Micro-benchmark: does int8 dot_general hit the TPU MXU 2x fast path?

TPU v5e peak is 197 bf16 TFLOP/s vs 394 int8 TOPS (2x). This tool times
flagship-encoder-shaped matmul chains in bf16 vs the W8A8 dynamic-quant
composite (ops/quant.quant_dense), so the quantized-serving decision is
based on measurement, not datasheet hope.

Timing rule (learned the hard way on the axon tunnel): each timed call's
OUTPUT must feed the next call's INPUT — blocking once on the last output
of N independent calls under-counts wildly here (overlapped execution
across dispatches), yielding impossible >peak numbers. Within a call the
chain is serialized by data dependency anyway.

Usage: python tools/int8_microbench.py  (prints ms + achieved TFLOP/s)
"""

from __future__ import annotations

import os
import sys
import time

import jax

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)
_cache_dir = os.path.join(_repo, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from amira_rust_asr_server_tpu.ops.quant import quant_dense  # noqa: E402


def timeit_chained(fn, x0, iters=8):
    """fn(x) -> same-shaped x; outputs thread into inputs so calls cannot
    overlap. Returns seconds per call."""
    x = fn(x0)
    np.asarray(x[:1, :8])  # compile + warm (host readback: on axon
    # block_until_ready can return before execution finishes — repo gotcha)
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    np.asarray(x[:1, :8])  # final sync must be a host readback too
    return (time.perf_counter() - t0) / iters


def main():
    # flagship-encoder-like shapes: rows = B*T' = 6016, FF matmul 1024x4096
    m, k, n = 6016, 1024, 4096
    reps = 8  # matmul pairs per call; in-call chain is dependency-ordered
    flop = 2 * m * k * n * 2 * reps

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((n, k)) * 0.02, jnp.bfloat16)

    @jax.jit
    def bf16_chain(x):
        for _ in range(reps):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            x = jnp.dot(y.astype(jnp.bfloat16), wb,
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        return x

    @jax.jit
    def w8a8_chain(x):
        """The serving composite (auto-routes: Pallas fused kernel on TPU,
        XLA int8 dot elsewhere)."""
        for _ in range(reps):
            y = quant_dense(x, w)
            x = quant_dense(y, wb)
        return x

    from amira_rust_asr_server_tpu.ops.quant import quantize_weight_int8

    @jax.jit
    def w8a8_xla_chain(x):
        """Force the XLA composite (int32 product round-trips HBM)."""
        from amira_rust_asr_server_tpu.ops.quant import quantize_act_int8
        for _ in range(reps):
            for wt in (w, wb):
                wq, ws = quantize_weight_int8(wt)
                xq, s = quantize_act_int8(x)
                y = jax.lax.dot_general(
                    xq, wq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                x = (y.astype(jnp.float32) * s * ws).astype(jnp.bfloat16)
        return x

    print("device:", jax.devices()[0].device_kind, file=sys.stderr)
    t_bf = timeit_chained(bf16_chain, x0)
    print(f"bf16 dense : {t_bf*1e3:8.2f} ms  "
          f"{flop/t_bf/1e12:7.1f} TFLOP/s")
    t_x = timeit_chained(w8a8_xla_chain, x0)
    print(f"w8a8 (xla) : {t_x*1e3:8.2f} ms  "
          f"{flop/t_x/1e12:7.1f} TOP/s(effective)  "
          f"speedup x{t_bf/t_x:.2f}")
    t_q = timeit_chained(w8a8_chain, x0)
    print(f"w8a8 (auto): {t_q*1e3:8.2f} ms  "
          f"{flop/t_q/1e12:7.1f} TOP/s(effective)  "
          f"speedup x{t_bf/t_q:.2f}")


if __name__ == "__main__":
    main()
