"""RNN-T (transducer) loss, TPU-native formulation.

The reference stack is inference-only (its "checkpoints" are fixed ONNX
files, SURVEY.md §5), but a complete framework must train the models it
serves, and the driver's multi-chip dryrun exercises a full training step —
so the loss is first-class here.

Formulation notes (vs the usual [B,T,U,V] lattice materialization):
- The joint lattice is NEVER materialized. A ``lax.scan`` over encoder
  frames computes each frame's [B, U+1, V] logits, log-softmaxes, gathers
  blank/label log-probs, and immediately folds them into the forward
  variable — peak memory O(B*U*V) instead of O(B*T*U*V). XLA remats the
  per-frame joint in the backward pass.
- The within-frame recurrence
      alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                              alpha[t, u-1] + label[t, u-1])
  is a linear recurrence in the log semiring; it is solved per frame with
  a vectorized prefix: alpha_row = A + logcumsumexp(c - A) where
  A = cumsum(label-logprobs) — implemented with
  ``lax.associative_scan(logaddexp)``. No O(U) sequential inner loop.

Supports variable T (enc_lens) and U (label_lens) via gather-at-ends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _logcumsumexp(x: jax.Array, axis: int = -1) -> jax.Array:
    return jax.lax.associative_scan(jnp.logaddexp, x, axis=axis)


def rnnt_loss(log_probs_fn, enc: jax.Array, enc_lens: jax.Array,
              labels: jax.Array, label_lens: jax.Array,
              blank_id: int) -> jax.Array:
    """Negative log-likelihood per sequence.

    Args:
      log_probs_fn: (enc_frame [B, D]) -> log-probs [B, U+1, V] — the joint
        applied against the precomputed prediction-net outputs for this
        batch (closure supplies them; see :func:`transducer_loss`).
      enc: [B, T, D] encoder output.
      enc_lens: [B] valid frame counts.
      labels: [B, U] int32 target labels.
      label_lens: [B] valid label counts.

    Returns: [B] loss values.
    """
    b, t_max, _ = enc.shape
    u_max = labels.shape[1]
    u_arange = jnp.arange(u_max + 1)

    # a_u = label logprob consumed moving u-1 -> u (a_0 = 0 padding)
    def frame_lp(enc_t):
        lp = log_probs_fn(enc_t)                        # [B, U+1, V]
        lp_blank = lp[:, :, blank_id]                   # [B, U+1]
        labels_ext = jnp.concatenate(
            [labels, jnp.zeros((b, 1), labels.dtype)], axis=1)
        lp_label = jnp.take_along_axis(
            lp, labels_ext[:, :, None], axis=2)[:, :, 0]  # [B, U+1]
        # invalidate label transitions at/after u = label_len
        u_valid = u_arange[None, :] < label_lens[:, None]
        lp_label = jnp.where(u_valid, lp_label, NEG_INF)
        return lp_blank, lp_label

    def step(carry, enc_t):
        alpha_prev, lp_blank_prev = carry
        lp_blank, lp_label = frame_lp(enc_t)

        # c_u = alpha[t-1, u] + blank[t-1, u]; row recurrence via prefix
        c = alpha_prev + lp_blank_prev                  # [B, U+1]
        a = jnp.concatenate(
            [jnp.zeros((b, 1)), lp_label[:, :-1]], axis=1)  # shift: a_u=label[u-1]
        a_cum = jnp.cumsum(a, axis=1)
        alpha_row = a_cum + _logcumsumexp(c - a_cum, axis=1)

        # candidate terminal: alpha[t, U] + blank[t, U]
        terminal = (jnp.take_along_axis(
            alpha_row, label_lens[:, None], axis=1)[:, 0]
            + jnp.take_along_axis(
                lp_blank, label_lens[:, None], axis=1)[:, 0])
        return (alpha_row, lp_blank), terminal

    alpha0 = jnp.full((b, u_max + 1), NEG_INF).at[:, 0].set(0.0)
    lp_blank0 = jnp.zeros((b, u_max + 1))
    enc_t_first = jnp.swapaxes(enc, 0, 1)               # [T, B, D]
    (_, _), terminals = jax.lax.scan(step, (alpha0, lp_blank0), enc_t_first)
    # terminals: [T, B]; pick t = enc_len - 1 per sequence
    t_idx = jnp.arange(t_max)[:, None]                  # [T, 1]
    pick = t_idx == (enc_lens[None, :] - 1)
    ll = jnp.sum(jnp.where(pick, terminals, 0.0), axis=0)
    return -ll


def transducer_loss(model, params, enc: jax.Array, enc_lens: jax.Array,
                    labels: jax.Array, label_lens: jax.Array) -> jax.Array:
    """Bind :func:`rnnt_loss` to a Transducer: runs the prediction net
    teacher-forced, then folds the joint frame-by-frame."""
    cfg = model.config
    b = enc.shape[0]
    state0 = model.init_state(b, dtype=enc.dtype)
    pred_seq, _ = model.predict_forward(params, labels, state0)  # [B,U+1,P]

    def log_probs_fn(enc_t):
        logits = model.joint_full(
            params, enc_t[:, None, :], pred_seq)        # [B, 1, U+1, V]
        return jax.nn.log_softmax(logits[:, 0], axis=-1)

    return rnnt_loss(log_probs_fn, enc, enc_lens, labels, label_lens,
                     cfg.blank_id)


def rnnt_loss_oracle(log_probs, enc_len: int, labels, blank_id: int
                     ) -> float:
    """O(T*U) NumPy reference DP for tests: log_probs [T, U+1, V]."""
    import numpy as np
    u_len = len(labels)
    alpha = np.full((enc_len, u_len + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(enc_len):
        for u in range(u_len + 1):
            if t == 0 and u == 0:
                continue
            acc = -np.inf
            if t > 0:
                acc = np.logaddexp(
                    acc, alpha[t - 1, u] + log_probs[t - 1, u, blank_id])
            if u > 0:
                acc = np.logaddexp(
                    acc, alpha[t, u - 1] + log_probs[t, u - 1, labels[u - 1]])
            alpha[t, u] = acc
    return float(-(alpha[enc_len - 1, u_len]
                   + log_probs[enc_len - 1, u_len, blank_id]))
