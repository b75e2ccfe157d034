"""Sharded training step for the transducer.

One pjit'd function: features -> encoder -> prediction net -> frame-folded
RNN-T loss -> grads -> optax update, with parameters tensor-sharded over
the ``model`` mesh axis and the batch sharded over ``data``
(see mesh.py). The driver's multi-chip dryrun runs exactly this.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import Transducer
from ..ops import log_mel_features
from ..ops.rnnt_loss import transducer_loss
from .mesh import data_sharding, replicated, shard_params


class TrainBatch(NamedTuple):
    audio: jax.Array        # [B, N] f32 waveforms
    audio_lens: jax.Array   # [B] int32
    labels: jax.Array       # [B, U] int32
    label_lens: jax.Array   # [B] int32


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-3,
                   clip: float = 1.0) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, weight_decay=weight_decay))


def loss_fn(model: Transducer, params, batch: TrainBatch) -> jax.Array:
    feats, feat_lens = log_mel_features(
        batch.audio, batch.audio_lens, n_mels=model.config.n_mels)
    enc, enc_lens = model.encode(params, feats, feat_lens)
    losses = transducer_loss(model, params, enc, enc_lens,
                             batch.labels, batch.label_lens)
    # normalize by label count (frames-free convention)
    denom = jnp.maximum(batch.label_lens.sum(), 1).astype(losses.dtype)
    return losses.sum() / denom


def ctc_loss_fn(model, params, batch: TrainBatch) -> jax.Array:
    """CTC-family loss with the same per-label normalization as the
    transducer's, so learning rates transfer between families."""
    from ..ops.ctc import ctc_loss
    feats, feat_lens = log_mel_features(
        batch.audio, batch.audio_lens, n_mels=model.config.n_mels)
    enc, enc_lens = model.encode(params, feats, feat_lens)
    losses = ctc_loss(model.log_probs(params, enc), enc_lens,
                      batch.labels, batch.label_lens,
                      model.config.blank_id)
    denom = jnp.maximum(batch.label_lens.sum(), 1).astype(losses.dtype)
    return losses.sum() / denom


def aed_loss_fn(model, params, batch: TrainBatch) -> jax.Array:
    """AED-family teacher-forced CE (models/aed.py). Already mean
    per-token including the EOS position, matching the per-label
    normalization convention of the other families."""
    feats, feat_lens = log_mel_features(
        batch.audio, batch.audio_lens, n_mels=model.config.n_mels)
    return model.loss(params, feats, feat_lens,
                      batch.labels, batch.label_lens)


def make_seq_parallel_loss(mesh: Mesh, base: str = "rnnt"):
    """RNN-T/CTC loss with **sequence-parallel** activation shardings
    (Megatron-SP convention: the time axis is sharded over the same mesh
    axis as tensor parallelism). GSPMD propagates the time sharding
    through the elementwise/conv/layernorm work — the bandwidth-bound
    bulk of the conformer — and inserts the all-gathers only where
    attention genuinely needs cross-chunk keys/values. Long-form audio
    (30 s buckets, T'=376 frames) is where this pays: per-chip activation
    residency drops by the TP factor.
    """
    from ..ops.ctc import ctc_loss
    from .mesh import DATA_AXIS, MODEL_AXIS

    feat_spec = NamedSharding(mesh, P(DATA_AXIS, None, MODEL_AXIS))
    enc_spec = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))

    def f(model, params, batch: TrainBatch) -> jax.Array:
        feats, feat_lens = log_mel_features(
            batch.audio, batch.audio_lens, n_mels=model.config.n_mels)
        feats = jax.lax.with_sharding_constraint(feats, feat_spec)
        enc, enc_lens = model.encode(params, feats, feat_lens)
        enc = jax.lax.with_sharding_constraint(enc, enc_spec)
        if base == "ctc":
            losses = ctc_loss(model.log_probs(params, enc), enc_lens,
                              batch.labels, batch.label_lens,
                              model.config.blank_id)
        else:
            losses = transducer_loss(model, params, enc, enc_lens,
                                     batch.labels, batch.label_lens)
        denom = jnp.maximum(batch.label_lens.sum(), 1).astype(losses.dtype)
        return losses.sum() / denom

    return f


def make_train_step(model, optimizer, mesh: Optional[Mesh] = None,
                    donate: bool = True, loss=loss_fn):
    """Build a jitted (params, opt_state, batch) -> (params, opt_state,
    loss) step; when ``mesh`` is given, in/out shardings pin params to
    their TP layout and the batch to the data axis. ``loss`` is a
    callable (model, params, batch) -> scalar; defaults to the
    transducer's, pass ``ctc_loss_fn`` for the CTC family."""

    def step(params, opt_state, batch: TrainBatch):
        loss_val, grads = jax.value_and_grad(
            lambda p: loss(model, p, batch))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    def jitted_for(params, opt_state):
        """Pin in/out shardings to the *actual* placement of the sharded
        params/opt_state (opt_state moments inherit the params' TP layout
        from optax.init on sharded params) and the batch to the data axis;
        outputs keep the same layout so steps chain without resharding."""
        p_sh = jax.tree_util.tree_map(lambda x: x.sharding, params)
        o_sh = jax.tree_util.tree_map(lambda x: x.sharding, opt_state)
        b_sh = TrainBatch(
            audio=data_sharding(mesh, 2), audio_lens=data_sharding(mesh, 1),
            labels=data_sharding(mesh, 2), label_lens=data_sharding(mesh, 1))
        return jax.jit(
            step,
            in_shardings=(p_sh, o_sh, b_sh),
            out_shardings=(p_sh, o_sh, replicated(mesh)),
            donate_argnums=(0, 1) if donate else ())

    return jitted_for


def init_training(model: Transducer, rng: jax.Array, optimizer,
                  mesh: Optional[Mesh] = None, fsdp: bool = False):
    """Initialize (sharded) params + optimizer state."""
    params = model.init(rng)
    if mesh is not None:
        params = shard_params(mesh, params, fsdp=fsdp)
    opt_state = optimizer.init(params)
    if mesh is not None:
        # moments mirror the params' shardings via zeros_like; scalars
        # (e.g. adam's count) land on a single device — replicate them
        # onto the mesh so the jitted step sees one device set
        def place(x):
            sh = getattr(x, "sharding", None)
            if isinstance(sh, NamedSharding) and sh.mesh == mesh:
                return x
            return jax.device_put(x, replicated(mesh))
        opt_state = jax.tree_util.tree_map(place, opt_state)
    return params, opt_state
