"""Batched greedy RNN-T decoding as one on-device program.

This is the framework's north-star kernel. The reference runs this loop on
the host with ONE gRPC round-trip to Triton per emitted symbol
(ref: src/asr/decoder_optimized.rs:206-324 and the decode_step closure at
src/asr/pipeline.rs:323-348) — for 30 s audio that is 300+ serialized
network hops. Here the entire loop — frame pointer advance, prediction-net
LSTM step, joint evaluation, argmax, blank/symbol bookkeeping — is a single
``lax.while_loop`` compiled into the same XLA program as the encoder, so
the only host interaction is the final [B, max_tokens] token buffer D2H.

Algorithm: *label-looping* batched greedy (cf. "speed of light" RNN-T
decoding). All lanes step in lockstep, but each lane owns an independent
frame pointer: a lane that argmaxes blank advances its pointer, a lane that
emits stays on its frame (up to ``max_symbols`` per frame — the forced
advance at 30 matches constants.rs:135). Total iterations =
max over lanes of (frames + emitted symbols), with every iteration doing
fully-batched MXU work (one fused LSTM step + joint matmul for all lanes).

Loop semantics parity (ref: decoder_optimized.rs:242-311):
- inner symbol cap per frame: ``max_symbols`` (default 30)
- global cap ``max_total`` (default 200)
- blank advances the frame; emission feeds the prediction net.

The joint/pred callables are injectable — the same testing seam the
reference uses (mock decode_fn, decoder_optimized.rs:331-366).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..constants import MAX_SYMBOLS_PER_STEP, MAX_TOTAL_TOKENS

# pred_fn(tokens [B], state) -> (pred_out [B, P], new_state)
PredFn = Callable
# joint_fn(enc_frame [B, D], pred_out [B, P]) -> logits [B, V]
JointFn = Callable


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GreedyResult:
    """Decode output; ``tokens[i, :counts[i]]`` are the emitted ids and
    ``frame_idx`` their encoder-frame positions (for timestamps /
    incremental accumulation)."""

    tokens: jax.Array      # [B, max_total] int32 (undefined past counts)
    counts: jax.Array      # [B] int32
    frame_idx: jax.Array   # [B, max_total] int32
    confidence: jax.Array  # [B, max_total] f32 softmax prob of each token
    state: Tuple[jax.Array, jax.Array]   # prediction-net (h, c)
    pred_out: jax.Array    # [B, P] last prediction-net output
    last_token: jax.Array  # [B] int32 last emitted (blank if none)


def greedy_decode(pred_fn: PredFn, joint_fn: JointFn, enc: jax.Array,
                  enc_lens: jax.Array, init_state, blank_id: int,
                  *, max_symbols: int = MAX_SYMBOLS_PER_STEP,
                  max_total: int = MAX_TOTAL_TOKENS,
                  lookahead: int = 8,
                  fused_step_fn: Optional[Callable] = None,
                  init_pred_out: Optional[jax.Array] = None,
                  init_last_token: Optional[jax.Array] = None,
                  token_offset: Optional[jax.Array] = None) -> GreedyResult:
    """Label-looping batched greedy decode.

    Args:
      enc: [B, T, D] encoder output.
      enc_lens: [B] valid frames per lane.
      init_state: prediction-net state (h, c) — zeros for a fresh decode, or
        the carried state when resuming a stream chunk (the HBM-resident
        analogue of the reference's carried DecoderState,
        ref: src/asr/incremental.rs:51,143).
      init_pred_out / init_last_token: carried prediction-net output and
        last emitted token for stream resume; None = fresh (SOS/blank).
      token_offset: [B] tokens pre-counted toward this call's ``max_total``
        budget. Callers pass 0 for reference parity: MAX_TOTAL_TOKENS is a
        per-decode-call budget (the reference's counter is local to each
        greedy_decode, ref: decoder_optimized.rs:78-92,229-243), never a
        session accumulator — a session accumulator would silently mute
        streams past ~200 tokens.

    Returns a :class:`GreedyResult`; all outputs stay on device.
    """
    b, t_max, _ = enc.shape
    enc_lens = enc_lens.astype(jnp.int32)

    if init_last_token is None:
        init_last_token = jnp.full((b,), blank_id, jnp.int32)
    if init_pred_out is None:
        init_pred_out, init_state = pred_fn(init_last_token, init_state)
    if token_offset is None:
        token_offset = jnp.zeros((b,), jnp.int32)

    lanes = jnp.arange(b)

    def cond(carry):
        t, counts, *_ = carry
        # `counts` starts at token_offset (0 from all serving callers —
        # per-call budget, see the docstring) and caps at max_total
        return jnp.any((t < enc_lens) & (counts < max_total))

    def body(carry):
        (t, counts, sym_in_frame, pred_out, state, last_token, tokens,
         frame_idx, confs) = carry

        active = (t < enc_lens) & (counts < max_total)

        # Frame lookahead: the prediction-net output only changes on an
        # emission, so the joint can be evaluated for `lookahead` frames
        # ahead in one shot (weights read once), and a run of blanks is
        # skipped in a single iteration. Exactly equivalent to the
        # one-frame loop: greedy's decision at frame t depends only on
        # (t, pred_out).
        f = lookahead
        t_win = t[:, None] + jnp.arange(f)[None, :]            # [B, F]
        valid = (t_win < enc_lens[:, None])
        t_win_safe = jnp.minimum(t_win, t_max - 1)
        enc_win = jnp.take_along_axis(
            enc, t_win_safe[:, :, None], axis=1)               # [B, F, D]

        if fused_step_fn is not None:
            # experimental Pallas path: joint + argmax + confidence fused
            # in one VMEM-resident kernel (ops/pallas/decode_step.py)
            k_win, conf_all = fused_step_fn(enc_win, pred_out)
        else:
            logits = joint_fn(
                enc_win.reshape(b * f, -1),
                jnp.repeat(pred_out, f, axis=0)).reshape(b, f, -1)
            k_win = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # per-token confidence: softmax prob of the argmax
            lse = jax.scipy.special.logsumexp(
                logits.astype(jnp.float32), axis=-1)           # [B, F]
            conf_all = jnp.exp(jnp.take_along_axis(
                logits.astype(jnp.float32), k_win[:, :, None],
                axis=2)[:, :, 0] - lse)                        # [B, F]
        nonblank = (k_win != blank_id) & valid
        any_nb = jnp.any(nonblank, axis=1)                     # [B]
        j = jnp.argmax(nonblank, axis=1).astype(jnp.int32)     # first hit
        k = jnp.take_along_axis(k_win, j[:, None], axis=1)[:, 0]
        conf = jnp.take_along_axis(conf_all, j[:, None], axis=1)[:, 0]

        # a lane at its per-frame symbol cap advances one frame instead
        # (ref: MAX_SYMBOLS_PER_STEP forced advance)
        forced_advance = active & (sym_in_frame >= max_symbols)
        emit = active & ~forced_advance & any_nb
        skip = active & ~forced_advance & ~any_nb

        # record emissions
        slot = jnp.clip(counts - token_offset, 0, max_total - 1)
        emit_frame = t + j
        tokens = tokens.at[lanes, slot].set(
            jnp.where(emit, k, tokens[lanes, slot]))
        frame_idx = frame_idx.at[lanes, slot].set(
            jnp.where(emit, emit_frame, frame_idx[lanes, slot]))
        confs = confs.at[lanes, slot].set(
            jnp.where(emit, conf, confs[lanes, slot]))
        counts = counts + emit.astype(jnp.int32)

        # pointer/cap bookkeeping:
        # - emit at j: frame moves to t+j; same-frame emission (j=0)
        #   increments the cap counter, a new frame restarts it at 1
        # - no nonblank in window: skip past all checked valid frames
        # - forced advance: one frame, cap reset
        n_valid = jnp.sum(valid, axis=1).astype(jnp.int32)
        t = jnp.where(emit, t + j,
                      jnp.where(skip, t + n_valid,
                                t + forced_advance.astype(jnp.int32)))
        sym_in_frame = jnp.where(
            emit, jnp.where(j > 0, 1, sym_in_frame + 1),
            jnp.where(skip | forced_advance, 0, sym_in_frame))

        # prediction-net step for emitting lanes (computed for all, merged
        # per lane — batched MXU work either way)
        fed = jnp.where(emit, k, last_token)
        new_pred_out, new_state = pred_fn(fed, state)
        pred_out = jnp.where(emit[:, None], new_pred_out, pred_out)

        def _sel(new, old):
            # state leaves are [L, B, ...] (batch on axis 1)
            shape = [1] * new.ndim
            shape[1] = b
            return jnp.where(emit.reshape(shape), new, old)

        state = jax.tree_util.tree_map(_sel, new_state, state)
        last_token = jnp.where(emit, k, last_token)

        return (t, counts, sym_in_frame, pred_out, state, last_token,
                tokens, frame_idx, confs)

    init = (
        jnp.zeros((b,), jnp.int32),                  # t
        token_offset.astype(jnp.int32),              # counts
        jnp.zeros((b,), jnp.int32),                  # symbols in frame
        init_pred_out,
        init_state,
        init_last_token,
        jnp.full((b, max_total), blank_id, jnp.int32),
        jnp.zeros((b, max_total), jnp.int32),
        jnp.zeros((b, max_total), jnp.float32),
    )
    (t, counts, _, pred_out, state, last_token, tokens,
     frame_idx, confs) = jax.lax.while_loop(cond, body, init)

    return GreedyResult(tokens=tokens, counts=counts - token_offset,
                        frame_idx=frame_idx, confidence=confs, state=state,
                        pred_out=pred_out, last_token=last_token)


def greedy_decode_transducer(model, params, enc: jax.Array,
                             enc_lens: jax.Array, *, carry=None,
                             max_symbols: int = MAX_SYMBOLS_PER_STEP,
                             max_total: int = MAX_TOTAL_TOKENS,
                             lookahead: int = 8) -> GreedyResult:
    """Bind :func:`greedy_decode` to a Transducer model.

    ``carry`` is a previous GreedyResult (or None) — passing it resumes a
    stream with HBM-resident prediction-net state.
    """
    cfg = model.config
    pred_fn = partial(model.predict_step, params)
    # hoist the joint's encoder projection out of the loop: one big MXU
    # matmul up front, then only pred_proj + out per iteration
    enc = model.joint_precompute_enc(params, enc)
    joint_fn = partial(model.joint_step_pre, params)
    if carry is None:
        state = model.init_state(enc.shape[0], dtype=enc.dtype)
        pred_out = None
        last_token = None
    else:
        state, pred_out, last_token = (carry.state, carry.pred_out,
                                       carry.last_token)
    return greedy_decode(
        pred_fn, joint_fn, enc, enc_lens, state, cfg.blank_id,
        max_symbols=max_symbols, max_total=max_total, lookahead=lookahead,
        init_pred_out=pred_out, init_last_token=last_token)
