"""CTC loss and greedy decoding as pure, jittable JAX ops.

Second decode family beyond the RNN-T transducer (the reference serves
only RNN-T; CTC is additive capability — a strict subset of the serving
contract: encoder frames -> per-frame vocab logits, no prediction net).

TPU shape discipline matches ops/rnnt_loss.py: one `lax.scan` over time,
everything else batched matrix/vector work with static shapes; padded
labels and per-example lengths handled by masking, never by dynamic
shapes. The loss is oracle-tested against torch.nn.functional.ctc_loss
(values and gradients) in tests/test_ctc.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Finite stand-in for -inf: keeps logsumexp/grad free of nan while being
# utterly negligible against real log-probs.
NEG_INF = -1.0e30


def _logaddexp(a: jax.Array, b: jax.Array) -> jax.Array:
    m = jnp.maximum(a, b)
    # where() guards the -inf corner: exp(NEG_INF - NEG_INF) would be 1
    return jnp.where(m <= NEG_INF, NEG_INF,
                     m + jnp.log1p(jnp.exp(-jnp.abs(a - b))))


def ctc_loss(log_probs: jax.Array, logit_lens: jax.Array,
             labels: jax.Array, label_lens: jax.Array,
             blank_id: int) -> jax.Array:
    """Per-example negative log-likelihood, shape [B].

    log_probs: [B, T, V] log-softmaxed frame posteriors
    logit_lens: [B] valid frame counts (<= T)
    labels: [B, L] padded label ids (pad value irrelevant)
    label_lens: [B] valid label counts (<= L); 0 is legal (all-blank path)

    Standard forward algorithm over the blank-interleaved extended
    sequence z = [blank, l1, blank, l2, ..., lL, blank] (S = 2L+1):
        alpha_t[s] = lp_t(z_s) + logsum(alpha_{t-1}[s], alpha_{t-1}[s-1],
                                        alpha_{t-1}[s-2] if allowed)
    where the s-2 skip is allowed only from a distinct non-blank label
    (z_s != blank and z_s != z_{s-2}).
    """
    b, t_max, _ = log_probs.shape
    if labels.shape[1] == 0:  # static all-blank edge: give masking a slot
        labels = jnp.zeros((b, 1), jnp.int32)
    l_max = labels.shape[1]
    s_max = 2 * l_max + 1

    # extended sequence ids [B, S] and the skip-allowed mask
    s_idx = jnp.arange(s_max)
    is_label = (s_idx % 2) == 1
    lab_pos = jnp.minimum(s_idx // 2, l_max - 1)
    z = jnp.where(is_label[None, :],
                  jnp.take_along_axis(
                      labels, jnp.broadcast_to(lab_pos[None, :], (b, s_max)),
                      axis=1),
                  blank_id)
    # valid extended positions: s < 2*label_len + 1
    s_valid = s_idx[None, :] < (2 * label_lens[:, None] + 1)
    # skip from s-2: non-blank, s >= 2, and different label than z_{s-2}
    z_m2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=blank_id)[:, :s_max]
    can_skip = is_label[None, :] & (s_idx[None, :] >= 2) & (z != z_m2)

    # alpha_0
    lp0 = log_probs[:, 0, :]
    alpha0 = jnp.full((b, s_max), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(lp0[:, blank_id])
    if l_max > 0:
        alpha0 = alpha0.at[:, 1].set(
            jnp.where(label_lens > 0,
                      jnp.take_along_axis(lp0, labels[:, :1], axis=1)[:, 0],
                      NEG_INF))
    alpha0 = jnp.where(s_valid, alpha0, NEG_INF)

    def step(alpha, lp_t_and_t):
        lp_t, t = lp_t_and_t
        stay = alpha
        prev1 = jnp.pad(alpha, ((0, 0), (1, 0)),
                        constant_values=NEG_INF)[:, :s_max]
        prev2 = jnp.pad(alpha, ((0, 0), (2, 0)),
                        constant_values=NEG_INF)[:, :s_max]
        prev2 = jnp.where(can_skip, prev2, NEG_INF)
        acc = _logaddexp(_logaddexp(stay, prev1), prev2)
        emit = jnp.take_along_axis(lp_t, z, axis=1)
        new = jnp.where(s_valid, acc + emit, NEG_INF)
        # frozen past each example's last frame so the final gather reads
        # alpha at t = logit_len - 1
        new = jnp.where((t < logit_lens)[:, None], new, alpha)
        return new, None

    ts = jnp.arange(1, t_max)
    alpha_final, _ = jax.lax.scan(
        step, alpha0, (jnp.swapaxes(log_probs[:, 1:], 0, 1), ts))

    # likelihood ends at z_{S-1} (final blank) or z_{S-2} (last label)
    end = 2 * label_lens  # index of the final blank in extended coords
    a_last = jnp.take_along_axis(alpha_final, end[:, None], axis=1)[:, 0]
    a_prev = jnp.where(
        label_lens > 0,
        jnp.take_along_axis(alpha_final,
                            jnp.maximum(end - 1, 0)[:, None], axis=1)[:, 0],
        NEG_INF)
    return -_logaddexp(a_last, a_prev)


def ctc_greedy_decode(log_probs: jax.Array, logit_lens: jax.Array,
                      blank_id: int) -> Tuple[jax.Array, jax.Array]:
    """Best-path decode: argmax per frame, collapse repeats, drop blanks.

    Returns (tokens [B, T] left-packed and blank-padded, counts [B]).
    Jittable: the pack is a cumsum-indexed scatter with drop semantics,
    no dynamic shapes.
    """
    b, t_max, _ = log_probs.shape
    path = jnp.argmax(log_probs, axis=-1)                       # [B, T]
    t_idx = jnp.arange(t_max)[None, :]
    valid_t = t_idx < logit_lens[:, None]
    path = jnp.where(valid_t, path, blank_id)
    prev = jnp.pad(path, ((0, 0), (1, 0)),
                   constant_values=blank_id)[:, :t_max]
    keep = (path != blank_id) & (path != prev) & valid_t        # [B, T]
    pos = jnp.cumsum(keep, axis=1) - 1                          # [B, T]
    pos = jnp.where(keep, pos, t_max)                           # drop slot
    out = jnp.full((b, t_max), blank_id, path.dtype)
    out = out.at[jnp.arange(b)[:, None], pos].set(path, mode="drop")
    counts = jnp.sum(keep, axis=1).astype(jnp.int32)
    return out, counts


def ctc_greedy_decode_timed(
        log_probs: jax.Array, logit_lens: jax.Array, blank_id: int
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Best-path decode with per-token frame indices and confidences.

    Same collapse semantics as :func:`ctc_greedy_decode`, additionally
    returning each kept token's emitting frame (the FIRST frame of its
    argmax run — the natural CTC timestamp) and its posterior there.
    Powers the serving path's ``token_details`` (TokenInfo parity,
    ref: src/asr/traits.rs TokenInfo timings/confidence).

    Returns (tokens [B, T], counts [B], frame_idx [B, T] int32,
    confidence [B, T] f32); entries past counts are padding.
    """
    b, t_max, _ = log_probs.shape
    path = jnp.argmax(log_probs, axis=-1)                       # [B, T]
    conf_t = jnp.exp(jnp.take_along_axis(
        log_probs, path[..., None], axis=-1))[..., 0]           # [B, T]
    t_idx = jnp.arange(t_max)[None, :]
    valid_t = t_idx < logit_lens[:, None]
    path = jnp.where(valid_t, path, blank_id)
    prev = jnp.pad(path, ((0, 0), (1, 0)),
                   constant_values=blank_id)[:, :t_max]
    keep = (path != blank_id) & (path != prev) & valid_t        # [B, T]
    pos = jnp.cumsum(keep, axis=1) - 1
    pos = jnp.where(keep, pos, t_max)
    rows = jnp.arange(b)[:, None]
    out = jnp.full((b, t_max), blank_id, path.dtype)
    out = out.at[rows, pos].set(path, mode="drop")
    frames = jnp.zeros((b, t_max), jnp.int32)
    frames = frames.at[rows, pos].set(
        jnp.broadcast_to(t_idx, path.shape), mode="drop")
    confs = jnp.zeros((b, t_max), jnp.float32)
    confs = confs.at[rows, pos].set(conf_t.astype(jnp.float32),
                                    mode="drop")
    counts = jnp.sum(keep, axis=1).astype(jnp.int32)
    return out, counts, frames, confs
