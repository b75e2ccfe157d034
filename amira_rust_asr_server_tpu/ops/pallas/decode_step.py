"""Fused joint + argmax decode-step Pallas kernel (experimental).

One kernel evaluates the greedy loop's per-iteration work for the whole
lookahead window:

    p      = pred_out @ Wp + bp                       (MXU)
    h      = relu(enc_win + p)                        (VPU)
    logits = h @ Wo_pad + bo_pad                      (MXU)
    k      = argmax(logits); conf = softmax prob      (VPU reductions)

without ever writing ``h`` or the [B*F, V] logits to HBM — only the
[B, F] token ids and confidences leave the kernel. The vocab axis is
lane-padded (1030 -> 1152 = 9x128) with a -1e30 pad bias so padding can
never win the argmax.

Weights fit VMEM comfortably (~2.3 MB bf16), so the whole step is one
VMEM-resident program per while_loop iteration. Enabled via
``greedy_decode(..., fused_step_fn=...)``; gated off by default
(config ``use_pallas_decode_step``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VOCAB_PAD = 1152  # 1030 -> 9 x 128 lanes
NEG = -1e30


def pad_joint_params(joint_params, vocab_size: int,
                     lane_pad: int = VOCAB_PAD):
    """Lane-pad the joint output matrices (pure jnp: traceable, so the
    padding hoists out of the decode loop as a loop constant)."""
    wo = joint_params["out"]["w"]
    bo = joint_params["out"]["b"].astype(jnp.float32)
    j, v = wo.shape
    assert v == vocab_size
    wo_pad = jnp.pad(wo, ((0, 0), (0, lane_pad - v)))
    bo_pad = jnp.pad(bo, (0, lane_pad - v), constant_values=NEG)
    return wo_pad, bo_pad


def _kernel(enc_ref, pred_ref, wp_ref, bp_ref, wo_ref, bo_ref,
            k_ref, conf_ref):
    """enc [BF, J], pred [BF, J] (pre-repeated), weights in VMEM."""
    p = jnp.dot(pred_ref[:], wp_ref[:],
                preferred_element_type=jnp.float32) + bp_ref[:]
    h = jnp.maximum(enc_ref[:].astype(jnp.float32) + p, 0.0)
    logits = jnp.dot(h.astype(enc_ref.dtype), wo_ref[:],
                     preferred_element_type=jnp.float32) + bo_ref[:]
    k = jnp.argmax(logits, axis=-1).astype(jnp.int32)       # [BF]
    m = jnp.max(logits, axis=-1)                            # [BF]
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[:, None]), axis=-1))
    conf = jnp.exp(m - lse)
    k_ref[:] = k[:, None]
    conf_ref[:] = conf[:, None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def joint_argmax_pallas(enc_win: jax.Array, pred_out: jax.Array,
                        wp: jax.Array, bp: jax.Array, wo_pad: jax.Array,
                        bo_pad: jax.Array, interpret: bool = False
                        ) -> Tuple[jax.Array, jax.Array]:
    """enc_win [B, F, J] x pred_out [B, J] -> (k [B, F] i32, conf [B, F]).

    Matches joint_step_pre + argmax + softmax-confidence, computed in f32.
    """
    b, f, j = enc_win.shape
    bf = b * f
    enc_flat = enc_win.reshape(bf, j)
    pred_rep = jnp.repeat(pred_out, f, axis=0)              # [BF, J]

    k, conf = pl.pallas_call(
        _kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((bf, 1), jnp.int32),
                   jax.ShapeDtypeStruct((bf, 1), jnp.float32)),
        interpret=interpret,
    )(enc_flat, pred_rep, wp, bp, wo_pad, bo_pad)
    return k.reshape(b, f), conf.reshape(b, f)


def make_fused_step_fn(model, params, interpret: bool = False):
    """Build a greedy_decode ``fused_step_fn`` bound to a Transducer's
    joint parameters (enc projection must already be hoisted, i.e. the
    decode loop runs over joint_precompute_enc output)."""
    jp = params["joint"]
    wo_pad, bo_pad = pad_joint_params(jp, model.config.vocab_size)
    dtype = jp["pred_proj"]["w"].dtype
    wp = jp["pred_proj"]["w"]
    bp = jp["pred_proj"]["b"].astype(jnp.float32)
    wo = wo_pad.astype(dtype)
    bo = bo_pad

    def step_fn(enc_win, pred_out):
        return joint_argmax_pallas(enc_win, pred_out.astype(dtype),
                                   wp, bp, wo, bo, interpret=interpret)

    return step_fn
