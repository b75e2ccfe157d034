"""RNN-T prediction network (2-layer LSTM) and joint network.

Contract parity (ref: model-repo/decoder_joint/config.pbtxt and
src/triton/model.rs:423-723): prediction state is two tensors
[pred_layers, B, d_pred] (h and c — the reference's input_states_1/2),
joint logits are [vocab_size]-wide with blank at ``blank_id``.

These are deliberately *plain functions over explicit param pytrees*
rather than flax modules: the greedy/beam decode loops call ``pred_step``
and ``joint_step`` inside ``lax.while_loop`` bodies thousands of times per
utterance, and raw pytree functions keep that hot path free of framework
indirection while remaining fully jit/vmap/pjit-compatible. (The encoder,
a single forward call, uses flax — see encoder.py.)

The blank token embeds to the zero vector (the RNN-T "start-of-sequence"
convention), implemented by masking rather than a padded table.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .presets import ModelConfig

PredParams = Dict
JointParams = Dict
PredState = Tuple[jax.Array, jax.Array]  # (h, c), each [L, B, d_pred]


# -- init -------------------------------------------------------------------
def init_pred_params(rng: jax.Array, cfg: ModelConfig,
                     dtype=jnp.float32) -> PredParams:
    keys = jax.random.split(rng, 1 + cfg.pred_layers)
    scale_e = 1.0 / jnp.sqrt(cfg.d_embed)
    params: PredParams = {
        "embed": jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.d_embed), dtype) * scale_e,
        "lstm": [],
    }
    d_in = cfg.d_embed
    for i in range(cfg.pred_layers):
        k = keys[1 + i]
        scale = 1.0 / jnp.sqrt(d_in + cfg.d_pred)
        params["lstm"].append({
            "w": jax.random.normal(
                k, (d_in + cfg.d_pred, 4 * cfg.d_pred), dtype) * scale,
            "b": jnp.zeros((4 * cfg.d_pred,), dtype),
        })
        d_in = cfg.d_pred
    return params


def init_joint_params(rng: jax.Array, cfg: ModelConfig,
                      dtype=jnp.float32) -> JointParams:
    k1, k2, k3 = jax.random.split(rng, 3)

    def dense(k, n_in, n_out):
        scale = 1.0 / jnp.sqrt(n_in)
        return {"w": jax.random.normal(k, (n_in, n_out), dtype) * scale,
                "b": jnp.zeros((n_out,), dtype)}

    return {
        "enc_proj": dense(k1, cfg.d_enc, cfg.d_joint),
        "pred_proj": dense(k2, cfg.d_pred, cfg.d_joint),
        "out": dense(k3, cfg.d_joint, cfg.vocab_size),
    }


def init_pred_state(batch: int, cfg: ModelConfig,
                    dtype=jnp.float32) -> PredState:
    shape = (cfg.pred_layers, batch, cfg.d_pred)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


# -- prediction network -----------------------------------------------------
def _lstm_cell(p, x: jax.Array, h: jax.Array, c: jax.Array):
    """One LSTM step: fused [x, h] @ W gate matmul (MXU-friendly)."""
    gates = jnp.concatenate([x, h], axis=-1) @ p["w"] + p["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def pred_step(params: PredParams, cfg: ModelConfig, tokens: jax.Array,
              state: PredState) -> Tuple[jax.Array, PredState]:
    """One prediction-net step.

    tokens [B] int32 (blank = SOS), state ([L,B,P], [L,B,P])
    -> (output [B, d_pred], new state).
    """
    h, c = state
    emb = params["embed"][tokens]  # [B, E]
    emb = jnp.where((tokens != cfg.blank_id)[:, None], emb, 0.0)
    x = emb
    new_h, new_c = [], []
    for layer, p in enumerate(params["lstm"]):
        hn, cn = _lstm_cell(p, x, h[layer], c[layer])
        new_h.append(hn)
        new_c.append(cn)
        x = hn
    return x, (jnp.stack(new_h), jnp.stack(new_c))


def pred_forward(params: PredParams, cfg: ModelConfig, targets: jax.Array,
                 state: PredState) -> Tuple[jax.Array, PredState]:
    """Teacher-forced scan for training.

    targets [B, U] int32 -> outputs [B, U+1, d_pred]: output u is the
    prediction-net summary of the first u labels (u=0 is the SOS/blank
    step), i.e. what the joint sees before emitting label u.
    """
    b, u = targets.shape
    sos = jnp.full((b, 1), cfg.blank_id, dtype=targets.dtype)
    inputs = jnp.concatenate([sos, targets], axis=1)  # [B, U+1]

    def body(st, tok):
        out, st2 = pred_step(params, cfg, tok, st)
        return st2, out

    final_state, outs = jax.lax.scan(body, state, inputs.T)
    return jnp.transpose(outs, (1, 0, 2)), final_state  # [B, U+1, P]


# -- joint network ----------------------------------------------------------
def joint_step(params: JointParams, enc_frame: jax.Array,
               pred_out: jax.Array) -> jax.Array:
    """enc_frame [B, d_enc] x pred_out [B, d_pred] -> logits [B, V]."""
    hidden = (enc_frame @ params["enc_proj"]["w"] + params["enc_proj"]["b"]
              + pred_out @ params["pred_proj"]["w"] + params["pred_proj"]["b"])
    hidden = jax.nn.relu(hidden)
    return hidden @ params["out"]["w"] + params["out"]["b"]


def joint_precompute_enc(params: JointParams, enc: jax.Array) -> jax.Array:
    """Project encoder output once for the whole utterance:
    [B, T, d_enc] -> [B, T, d_joint].

    The decode loop then only pays pred_proj + out per iteration — the
    d_enc x d_joint matmul (the joint's largest) moves out of the
    autoregressive loop into one large MXU-efficient batched matmul.
    """
    return jnp.einsum("btd,dj->btj", enc, params["enc_proj"]["w"]) \
        + params["enc_proj"]["b"]


def joint_step_pre(params: JointParams, enc_pre_frame: jax.Array,
                   pred_out: jax.Array) -> jax.Array:
    """Joint from a precomputed encoder projection [B, d_joint]."""
    hidden = jax.nn.relu(
        enc_pre_frame
        + pred_out @ params["pred_proj"]["w"] + params["pred_proj"]["b"])
    return hidden @ params["out"]["w"] + params["out"]["b"]


def joint_full(params: JointParams, enc: jax.Array, pred: jax.Array
               ) -> jax.Array:
    """Full lattice for training: [B,T,D] x [B,U,P] -> [B,T,U,V]."""
    e = jnp.einsum("btd,dj->btj", enc, params["enc_proj"]["w"]) \
        + params["enc_proj"]["b"]
    p = jnp.einsum("bup,pj->buj", pred, params["pred_proj"]["w"]) \
        + params["pred_proj"]["b"]
    hidden = jax.nn.relu(e[:, :, None, :] + p[:, None, :, :])
    return jnp.einsum("btuj,jv->btuv", hidden, params["out"]["w"]) \
        + params["out"]["b"]
