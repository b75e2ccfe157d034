"""Dynamic W8A8 int8 quantization for the serving path.

The datasheet credits the v5e MXU with 2x int8 peak (394 TOPS vs 197
bf16 TFLOP/s), but on this setup int8 dot_general measurably lowers at
the SAME MXU rate as bf16 — the win is bandwidth, not FLOPs: halved
weight-stream bytes, and (in the Pallas kernel) an int32 accumulator
that never round-trips HBM. The flagship encoder's dense matmuls are
~97% of the pipeline's FLOPs and its big layers are weight-bandwidth-
heavy at serving batch sizes, so quantizing just those layers is still
the largest serving lever after bf16 (~8% e2e measured;
tools/int8_microbench.py).

Scheme (standard dynamic post-training quant, no calibration pass):
- weights: symmetric per-output-channel int8 (scale = col amax / 127);
- activations: symmetric per-row (per-token) int8, scales computed on the
  fly from the live tensor — robust to outlier tokens vs per-tensor;
- matmul: int8 x int8 -> int32 on the MXU (preferred_element_type), then
  one fused dequant multiply by (row_scale x col_scale).

Weight quantization happens inside the jitted program; weights are
serving-constant, so the cost is one extra streaming pass over the
weights per program call (~1 ms for 421M params — measured small next to
the bandwidth saved). The param pytree is completely unchanged, so
checkpoints, training, and the non-quant path are untouched.

The reference has no quantization support at all (its ONNX/TensorRT path
runs fp16; ref: model-repo/*/config.pbtxt) — this is a capability the TPU
build adds on top of parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_weight_int8(kernel: jax.Array):
    """Per-output-channel symmetric int8. kernel [K, N] -> (int8 [K, N],
    f32 scale [N])."""
    k32 = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(k32), axis=0) / 127.0 + 1e-12
    wq = jnp.round(k32 / scale[None, :]).astype(jnp.int8)
    return wq, scale


def quantize_act_int8(x: jax.Array):
    """Per-row (last-axis) symmetric int8. x [..., K] -> (int8, f32 scale
    [..., 1])."""
    x32 = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0 + 1e-12
    xq = jnp.round(x32 / scale).astype(jnp.int8)
    return xq, scale


def _use_pallas(m: int, k: int, n: int) -> bool:
    """Pallas kernel pays off for encoder-sized tiles on TPU; tiny shapes
    (tests, toy presets) and CPU use the XLA path."""
    return (jax.default_backend() == "tpu"
            and m >= 256 and k % 128 == 0 and n % 128 == 0)


def quant_dense(x: jax.Array, kernel: jax.Array,
                bias: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ kernel (+ bias) through the int8 MXU path.

    x [..., K] any float dtype; kernel [K, N]; returns x.dtype.
    On TPU with encoder-sized shapes this runs the fused Pallas kernel
    (pallas/quant_matmul.py); elsewhere the plain XLA int8 composite.
    """
    wq, w_scale = quantize_weight_int8(kernel)
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = kernel.shape[1]
    x2 = x.reshape((-1, k))
    if _use_pallas(x2.shape[0], k, n):
        from .pallas.quant_matmul import quant_matmul_pallas
        b = (bias if bias is not None
             else jnp.zeros((n,), jnp.float32))
        return quant_matmul_pallas(x2, wq, w_scale, b).reshape((*lead, n))
    xq, a_scale = quantize_act_int8(x)
    y = jax.lax.dot_general(
        xq.reshape((-1, k)), wq,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32).reshape((*lead, -1))
    y = y * a_scale * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
