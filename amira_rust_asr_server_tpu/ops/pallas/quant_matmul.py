"""Pallas W8A8 matmul: in-kernel activation quant + int8 MXU + fused dequant.

The XLA-level quant path (ops/quant.quant_dense) measures only ~1.2x over
bf16 on the v5e: the int32 product tensor round-trips HBM before the
dequant multiply, and the act-quant pass materializes again. (Measured
here: int8 dot lowers at the SAME MXU rate as bf16 — the whole win is
bandwidth, so keeping intermediates in VMEM is the entire game.) This
kernel does, per (TM, TN) output tile:

    VMEM:  x_tile [TM, K] bf16  ->  row amax -> scale -> int8
           wq_tile [K, TN] int8 (pre-quantized per-output-channel outside)
    MXU:   acc = xq @ wq -> int32     (never leaves VMEM)
    VPU:   y = acc * (row_scale x col_scale) + bias -> bf16 -> HBM

so HBM sees exactly: x read, wq read (once per M-tile pass), y write —
less traffic than the bf16 matmul (weights at half the bytes), with the
int32 accumulator living and dying in VMEM.

Tiles: TM fixed 256/512 by K (double-buffered VMEM budget ~16 MB/core),
TN 1024; M may be ragged (row-independent math: garbage rows in the last
tile never pollute valid rows, and their writes land outside the array).
int8 sublane tiling requires TM % 32 == 0 (guide: min tile (32, 128)).

Used by ops/quant.quant_dense on TPU for encoder-sized matmuls; the
XLA path remains the fallback (CPU tests, small shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, ws_ref, b_ref, out_ref):
    x32 = x_ref[:].astype(jnp.float32)                     # [TM, K]
    s = jnp.max(jnp.abs(x32), axis=1, keepdims=True) / 127.0 + 1e-12
    xq = jnp.round(x32 / s).astype(jnp.int8)
    acc = jnp.dot(xq, wq_ref[:], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s * ws_ref[0, :][None, :])
    y = y + b_ref[0, :][None, :]
    out_ref[:] = y.astype(out_ref.dtype)


# Encoder weights are all <= ~4 MB as int8 (1024x4096 worst), so the whole
# weight stays VMEM-resident for the kernel's lifetime and the grid runs
# over M only: x, wq and out each cross HBM exactly ONCE (the tiled 2-D
# grid variant re-fetched wq per M-tile and was HBM-bound at ~1.2x bf16;
# this layout is compute-bound at the int8 MXU rate).
_WQ_VMEM_LIMIT = 6 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_matmul_pallas(x: jax.Array, wq: jax.Array, w_scale: jax.Array,
                        bias: jax.Array, *, interpret: bool = False
                        ) -> jax.Array:
    """x [M, K] float; wq [K, N] int8; w_scale [N] f32; bias [N] f32
    -> [M, N] x.dtype.  Requires K % 128 == 0 and N % 128 == 0."""
    m, k = x.shape
    n = wq.shape[1]
    if k * n <= _WQ_VMEM_LIMIT:
        # whole weight resident; TM=256 keeps x/out double-buffers + the
        # int32 accumulator value inside the ~16 MB VMEM budget
        tm = 256
        return pl.pallas_call(
            _kernel,
            grid=(pl.cdiv(m, tm),),
            in_specs=[
                pl.BlockSpec((tm, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
            interpret=interpret,
        )(x, wq, w_scale.astype(jnp.float32)[None, :],
          bias.astype(jnp.float32)[None, :])
    # fallback: 2-D tiled grid for weights too big to pin
    tm = 512 if k <= 2048 else 256
    tn = 1024 if n % 1024 == 0 else 512 if n % 512 == 0 else n
    grid = (pl.cdiv(m, tm), pl.cdiv(n, tn))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(x, wq, w_scale.astype(jnp.float32)[None, :],
      bias.astype(jnp.float32)[None, :])
