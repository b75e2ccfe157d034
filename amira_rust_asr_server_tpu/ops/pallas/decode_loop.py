"""The WHOLE greedy RNN-T decode loop as ONE persistent Pallas kernel.

The per-iteration fused kernel (decode_step.py) still leaves the 2-layer
LSTM, the embedding lookup and all bookkeeping to XLA, which re-streams
the ~13 MB of prediction-net weights from HBM every while_loop iteration
and pays many small-kernel latencies per step. Here the entire
label-looping loop (ref semantics: src/asr/decoder_optimized.rs:206-324,
matched by ops/greedy.py) runs inside a single kernel invocation:

  - ALL decode-path weights (embedding, 2 LSTM layers, pred_proj, padded
    joint out) are VMEM-resident for the kernel's lifetime — read from HBM
    exactly once per *utterance batch*, not once per emitted symbol;
  - the precomputed encoder projection [B, T', d_joint] sits in VMEM too,
    so the per-iteration window gather is a VMEM one-hot matmul, not an
    HBM DMA;
  - bookkeeping (frame pointers, symbol caps, token buffers) lives in
    loop-carried registers/VMEM values.

Semantics are exactly ops/greedy.greedy_decode's (same lookahead
equivalence, max_symbols forced advance, max_total per-call budget, carry
resume); equivalence is locked by tests/test_pallas_decode_loop.py
(interpret mode vs the XLA loop) and tools/tpu_selfcheck.py on hardware.

Mosaic lowering rules learned the hard way (all covered by tests):
  - a dynamic-start sublane slice silently misreads when the start isn't
    8-aligned -> the window gather is a one-hot matmul instead;
  - in-kernel jnp.dot defaults to a lossy bf16 MXU pass even for f32
    operands -> f32 dots carry precision=HIGHEST (bf16 operands must NOT:
    Mosaic rejects HIGHEST for them, and they're a single pass anyway);
  - Mosaic argmax breaks ties by the LAST index (XLA: first) -> the
    first-nonblank selection is an explicit min-index reduce;
  - argmax lowers only for f32 operands; take_along_axis has no general
    lowering (one-hot reduces instead).

The vocab axis is lane-padded to 1152 with -inf bias so padding never
wins the argmax; the embedding lookup is a one-hot matmul (MXU-friendly,
no gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_step import VOCAB_PAD, pad_joint_params


def _dot(a, b):
    """Matmul with f32 accumulation. HIGHEST is applied only to f32
    operands: it keeps the f32 path exact (the in-kernel default is a
    lossy bf16 MXU pass — repo gotcha), while Mosaic rejects HIGHEST for
    bf16 operands ("Bad lhs type") — which are a single exact-input pass
    anyway."""
    prec = (jax.lax.Precision.HIGHEST if a.dtype == jnp.float32 else None)
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def _qdot(x32, wq_ref, ws_ref):
    """W8A8 matmul for the VMEM-resident quant path: dynamic per-row
    activation quant -> int8 MXU dot (int32 accumulate, never leaves
    VMEM) -> fused dequant. x32 [B, K] f32, wq [K, N] int8 (pre-quantized
    per-output-channel), ws [1, N] f32 -> [B, N] f32."""
    s = jnp.max(jnp.abs(x32), axis=1, keepdims=True) / 127.0 + 1e-12
    xq = jnp.round(x32 / s).astype(jnp.int8)
    acc = jnp.dot(xq, wq_ref[:], preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (s * ws_ref[0, :][None, :])


def _make_kernel(b: int, t_max: int, f: int, vocab: int, blank_id: int,
                 max_symbols: int, max_total: int, d_pred: int,
                 d_joint: int, quant: bool = False):
    """Build the kernel body for static shapes.

    ``quant``: the two LSTM weight matrices (the bulk of the resident
    footprint, ~13 MB bf16 on the flagship) arrive int8 with per-output-
    channel scales, SPLIT at the x/h concat boundary so each half gets
    its own per-row activation scale (x and h ranges differ; one shared
    row scale over the concat costs accuracy in the recurrence)."""

    def kernel(*refs):
        if quant:
            (enc_ref, enc_lens_ref, h0_ref, c0_ref, pred0_ref, last0_ref,
             off_ref, embed_ref, wx0_ref, sx0_ref, wh0_ref, sh0_ref,
             bl0_ref, wx1_ref, sx1_ref, wh1_ref, sh1_ref, bl1_ref,
             wp_ref, bp_ref, wo_ref, bo_ref,
             tokens_ref, counts_ref, frames_ref, confs_ref,
             h_out_ref, c_out_ref, pred_out_ref, last_out_ref) = refs
        else:
            (enc_ref, enc_lens_ref, h0_ref, c0_ref, pred0_ref, last0_ref,
             off_ref, embed_ref, wl0_ref, bl0_ref, wl1_ref, bl1_ref,
             wp_ref, bp_ref, wo_ref, bo_ref,
             tokens_ref, counts_ref, frames_ref, confs_ref,
             h_out_ref, c_out_ref, pred_out_ref, last_out_ref) = refs
        enc_lens = enc_lens_ref[:, 0]                       # [B] i32
        off = off_ref[:, 0]                                 # [B] i32

        wp = wp_ref[:]
        bp = bp_ref[0, :]
        wo = wo_ref[:]
        bo = bo_ref[0, :]

        def pred_lstm(fed, h, c):
            """fed [B] i32 -> (pred_out [B, P], h', c')."""
            # one-hot embedding; the blank token embeds to zero (RNN-T SOS
            # convention, ref: models/decoder_joint.py pred_step)
            oh = (jax.lax.broadcasted_iota(jnp.int32, (b, vocab), 1)
                  == fed[:, None])
            oh = oh & (fed != blank_id)[:, None]
            x = _dot(oh.astype(embed_ref.dtype), embed_ref[:])  # [B, E]
            x = x.astype(embed_ref.dtype)
            # layer 0
            if quant:
                g = (_qdot(x.astype(jnp.float32), wx0_ref, sx0_ref)
                     + _qdot(h[0].astype(jnp.float32), wh0_ref, sh0_ref)
                     + bl0_ref[0, :])
            else:
                xh = jnp.concatenate([x, h[0]], axis=-1)
                g = _dot(xh, wl0_ref[:]) + bl0_ref[0, :]
            i0, f0, g0, o0 = jnp.split(g, 4, axis=-1)
            c0n = (jax.nn.sigmoid(f0 + 1.0) * c[0].astype(jnp.float32)
                   + jax.nn.sigmoid(i0) * jnp.tanh(g0))
            h0n = jax.nn.sigmoid(o0) * jnp.tanh(c0n)
            # layer 1
            if quant:
                g1 = (_qdot(h0n, wx1_ref, sx1_ref)
                      + _qdot(h[1].astype(jnp.float32), wh1_ref, sh1_ref)
                      + bl1_ref[0, :])
            else:
                xh1 = jnp.concatenate(
                    [h0n.astype(embed_ref.dtype), h[1]], axis=-1)
                g1 = _dot(xh1, wl1_ref[:]) + bl1_ref[0, :]
            i1, f1, g1g, o1 = jnp.split(g1, 4, axis=-1)
            c1n = (jax.nn.sigmoid(f1 + 1.0) * c[1].astype(jnp.float32)
                   + jax.nn.sigmoid(i1) * jnp.tanh(g1g))
            h1n = jax.nn.sigmoid(o1) * jnp.tanh(c1n)
            dt = embed_ref.dtype
            h_new = jnp.stack([h0n.astype(dt), h1n.astype(dt)])
            c_new = jnp.stack([c0n.astype(dt), c1n.astype(dt)])
            return h1n.astype(dt), h_new, c_new

        def joint_window(t, pred_out):
            """Evaluate the joint over the lookahead window.

            t [B] i32, pred_out [B, P] -> (k_win [B,F] i32, conf [B,F],
            t_win [B,F])."""
            p = _dot(pred_out, wp) + bp                      # [B, J] f32
            # per-lane window gather as a one-hot matmul (alignment-safe,
            # ~free on the MXU); per-element clip to t_max-1 matches
            # ops/greedy's t_win_safe exactly
            t_win = t[:, None] + jax.lax.broadcasted_iota(
                jnp.int32, (b, f), 1)                        # [B, F]
            t_sel = jnp.minimum(t_win, t_max - 1)
            col = jax.lax.broadcasted_iota(jnp.int32, (f, t_max), 1)
            rows = []
            for lane in range(b):
                oh = (col == t_sel[lane][:, None]).astype(enc_ref.dtype)
                rows.append(_dot(oh, enc_ref[lane]))
            enc_win = jnp.stack(rows)                        # [B, F, J] f32
            h = jnp.maximum(enc_win + p[:, None, :], 0.0)
            logits = _dot(h.reshape(b * f, d_joint).astype(enc_ref.dtype),
                          wo) + bo                           # [BF, Vp] f32
            k = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            m = jnp.max(logits, axis=-1)
            lse = m + jnp.log(
                jnp.sum(jnp.exp(logits - m[:, None]), axis=-1))
            conf = jnp.exp(m - lse)
            return k.reshape(b, f), conf.reshape(b, f), t_win

        def cond(carry):
            t, counts, *_ = carry
            return jnp.any((t < enc_lens) & (counts < max_total))

        def body(carry):
            (t, counts, sym, pred_out, h, c, last, tokens, frames,
             confs) = carry
            active = (t < enc_lens) & (counts < max_total)

            k_win, conf_all, t_win = joint_window(t, pred_out)
            valid = t_win < enc_lens[:, None]

            nonblank = (k_win != blank_id) & valid
            any_nb = jnp.any(nonblank, axis=1)
            # first nonblank position as an explicit min-index reduce
            pos = jax.lax.broadcasted_iota(jnp.int32, (b, f), 1)
            j = jnp.min(jnp.where(nonblank, pos, f), axis=1)
            j = jnp.minimum(j, f - 1).astype(jnp.int32)
            # gather along the window axis as a one-hot reduce
            j_hit = pos == j[:, None]
            k = jnp.sum(jnp.where(j_hit, k_win, 0), axis=1)
            conf = jnp.sum(jnp.where(j_hit, conf_all, 0.0), axis=1)
            emit_frame = jnp.sum(jnp.where(j_hit, t_win, 0), axis=1)

            forced = active & (sym >= max_symbols)
            emit = active & ~forced & any_nb
            skip = active & ~forced & ~any_nb

            slot = jnp.clip(counts - off, 0, max_total - 1)  # [B]
            col = jax.lax.broadcasted_iota(jnp.int32, (b, max_total), 1)
            hit = (col == slot[:, None]) & emit[:, None]
            tokens = jnp.where(hit, k[:, None], tokens)
            frames = jnp.where(hit, emit_frame[:, None], frames)
            confs = jnp.where(hit, conf[:, None], confs)
            counts = counts + emit.astype(jnp.int32)

            n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)
            adv = jnp.where(
                emit, emit_frame - t,
                jnp.where(skip, n_valid, forced.astype(jnp.int32)))
            new_t = t + adv
            sym = jnp.where(
                emit, jnp.where(emit_frame > t, 1, sym + 1),
                jnp.where(skip | forced, 0, sym))
            t = new_t

            fed = jnp.where(emit, k, last)
            new_pred, new_h, new_c = pred_lstm(fed, h, c)
            sel = emit[:, None]
            pred_out = jnp.where(sel, new_pred, pred_out)
            h = jnp.where(sel[None, :, :], new_h, h)
            c = jnp.where(sel[None, :, :], new_c, c)
            last = jnp.where(emit, k, last)

            return (t, counts, sym, pred_out, h, c, last, tokens, frames,
                    confs)

        init = (
            jnp.zeros((b,), jnp.int32),
            off,
            jnp.zeros((b,), jnp.int32),
            pred0_ref[:],
            jnp.stack([h0_ref[0], h0_ref[1]]),
            jnp.stack([c0_ref[0], c0_ref[1]]),
            last0_ref[:, 0],
            jnp.full((b, max_total), blank_id, jnp.int32),
            jnp.zeros((b, max_total), jnp.int32),
            jnp.zeros((b, max_total), jnp.float32),
        )
        (t, counts, sym, pred_out, h, c, last, tokens, frames, confs) = \
            jax.lax.while_loop(cond, body, init)

        tokens_ref[:] = tokens
        counts_ref[:] = (counts - off)[:, None]
        frames_ref[:] = frames
        confs_ref[:] = confs
        h_out_ref[:] = h
        c_out_ref[:] = c
        pred_out_ref[:] = pred_out
        last_out_ref[:] = last[:, None]

    return kernel


def quantize_pred_lstm(pred_params):
    """Pre-quantize the prediction-net LSTM weights for the int8-resident
    kernel path: per-output-channel symmetric int8, split at the x/h
    concat boundary (each half quantized and scaled independently).

    Returns a flat dict of device arrays meant to be computed ONCE at
    pipeline build (from the f32/bf16 params) and passed as jit arguments
    thereafter. Halves the decode kernel's VMEM weight residency
    (~13 MB -> ~6.6 MB bf16-equivalent on the flagship)."""
    out = {}
    for li, layer in enumerate(pred_params["lstm"]):
        w = layer["w"].astype(jnp.float32)          # [K, 4P]
        d_p = w.shape[1] // 4
        d_x = w.shape[0] - d_p                      # E (layer 0) or P
        for tag, part in (("x", w[:d_x]), ("h", w[d_x:])):
            s = jnp.max(jnp.abs(part), axis=0) / 127.0 + 1e-12  # [4P]
            q = jnp.clip(jnp.round(part / s[None, :]),
                         -127, 127).astype(jnp.int8)
            out[f"w{tag}{li}_q"] = q
            out[f"s{tag}{li}"] = s.astype(jnp.float32)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("blank_id", "max_symbols", "max_total", "lookahead",
                     "lane_block", "interpret"))
def greedy_loop_pallas(enc_pre: jax.Array, enc_lens: jax.Array,
                       h0: jax.Array, c0: jax.Array, pred0: jax.Array,
                       last0: jax.Array, token_offset: jax.Array,
                       pred_params, joint_params, pred_quant=None, *,
                       blank_id: int, max_symbols: int, max_total: int,
                       lookahead: int = 8, lane_block: int = 16,
                       interpret: bool = False):
    """Run the whole greedy decode on device in one kernel call.

    enc_pre: [B, T', d_joint] joint_precompute_enc output.
    pred_quant: optional quantize_pred_lstm output — holds the LSTM
    weights int8 in VMEM (W8A8 in-kernel) instead of bf16.
    Returns the same tuple greedy_decode packs into GreedyResult:
    (tokens, counts, frame_idx, confidence, (h, c), pred_out, last_token).
    """
    b, t_max, d_joint = enc_pre.shape
    vocab = joint_params["out"]["w"].shape[1]
    d_pred = pred_params["lstm"][0]["w"].shape[1] // 4
    dt = enc_pre.dtype
    lookahead = min(lookahead, t_max)  # window must fit the sequence

    wo_pad, bo_pad = pad_joint_params(joint_params, vocab)
    # embedding table padded to the lane-friendly vocab size
    embed = pred_params["embed"]
    embed_pad = jnp.pad(embed, ((0, VOCAB_PAD - vocab), (0, 0)))

    # lane blocking: enc_pre for 16 lanes of 30 s is ~8 MB of VMEM next to
    # ~13 MB of resident weights — larger batches (32+) must grid over
    # lane blocks (weights stay resident across grid steps; batch buckets
    # are powers of two so LB always divides b)
    lb = lane_block if b % lane_block == 0 else (16 if b % 16 == 0 else b)
    quant = pred_quant is not None
    kernel = _make_kernel(lb, t_max, lookahead, VOCAB_PAD, blank_id,
                          max_symbols, max_total, d_pred, d_joint,
                          quant=quant)

    lane2 = lambda shape: pl.BlockSpec(  # noqa: E731 — [B, X] lane-blocked
        (lb, shape), lambda i: (i, 0), memory_space=pltpu.VMEM)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_weights = 15 if quant else 9
    in_specs = [
        pl.BlockSpec((lb, t_max, d_joint), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),          # enc_pre
        lane2(1),                                       # enc_lens
        pl.BlockSpec((2, lb, d_pred), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),          # h0
        pl.BlockSpec((2, lb, d_pred), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),          # c0
        lane2(d_pred),                                  # pred0
        lane2(1),                                       # last0
        lane2(1),                                       # off
    ] + [whole] * n_weights                             # weights resident
    out_shape = (
        jax.ShapeDtypeStruct((b, max_total), jnp.int32),   # tokens
        jax.ShapeDtypeStruct((b, 1), jnp.int32),           # counts
        jax.ShapeDtypeStruct((b, max_total), jnp.int32),   # frames
        jax.ShapeDtypeStruct((b, max_total), jnp.float32),  # confs
        jax.ShapeDtypeStruct((2, b, d_pred), dt),          # h
        jax.ShapeDtypeStruct((2, b, d_pred), dt),          # c
        jax.ShapeDtypeStruct((b, d_pred), dt),             # pred_out
        jax.ShapeDtypeStruct((b, 1), jnp.int32),           # last_token
    )
    out_specs = (
        lane2(max_total), lane2(1), lane2(max_total), lane2(max_total),
        pl.BlockSpec((2, lb, d_pred), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, lb, d_pred), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        lane2(d_pred), lane2(1),
    )
    if quant:
        pq = pred_quant
        lstm_args = (
            pq["wx0_q"], pq["sx0"][None, :], pq["wh0_q"], pq["sh0"][None, :],
            pred_params["lstm"][0]["b"].astype(jnp.float32)[None, :],
            pq["wx1_q"], pq["sx1"][None, :], pq["wh1_q"], pq["sh1"][None, :],
            pred_params["lstm"][1]["b"].astype(jnp.float32)[None, :])
    else:
        lstm_args = (
            pred_params["lstm"][0]["w"].astype(dt),
            pred_params["lstm"][0]["b"].astype(jnp.float32)[None, :],
            pred_params["lstm"][1]["w"].astype(dt),
            pred_params["lstm"][1]["b"].astype(jnp.float32)[None, :])
    outs = pl.pallas_call(
        kernel,
        grid=(b // lb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(enc_pre, enc_lens.astype(jnp.int32)[:, None],
      h0.astype(dt), c0.astype(dt), pred0.astype(dt),
      last0.astype(jnp.int32)[:, None],
      token_offset.astype(jnp.int32)[:, None],
      embed_pad.astype(dt),
      *lstm_args,
      joint_params["pred_proj"]["w"].astype(dt),
      joint_params["pred_proj"]["b"].astype(jnp.float32)[None, :],
      wo_pad.astype(dt), bo_pad[None, :])
    (tokens, counts, frames, confs, h, c, pred_out, last) = outs
    return (tokens, counts[:, 0], frames, confs, (h, c), pred_out,
            last[:, 0])
