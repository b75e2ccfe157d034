"""The full RNN-T transducer bundle: encoder + prediction net + joint.

Replaces the reference's three Triton-served ONNX models
(ref: src/triton/model.rs — PreprocessorModel / EncoderModel /
DecoderJointModel) with one parameter pytree and pure apply functions,
all resident in HBM and invoked in-process.

Checkpointing uses orbax (ref analogue: the ONNX files in model-repo/ are
the reference's "checkpoints"; SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .decoder_joint import (init_joint_params, init_pred_params,
                            init_pred_state, joint_full, joint_step,
                            pred_forward, pred_step)
from .encoder import ConformerEncoder
from .presets import ModelConfig, get_preset

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Transducer:
    """Stateless model definition; parameters live in an external pytree."""

    config: ModelConfig

    # -- construction -------------------------------------------------------
    @classmethod
    def from_preset(cls, name: str) -> "Transducer":
        return cls(get_preset(name))

    def init(self, rng: jax.Array, dtype=jnp.float32) -> Params:
        k_enc, k_pred, k_joint = jax.random.split(rng, 3)
        cfg = self.config
        enc_mod = ConformerEncoder(cfg)
        dummy_feats = jnp.zeros((1, cfg.n_mels, 2 * cfg.subsampling_factor),
                                dtype)
        dummy_lens = jnp.array([2 * cfg.subsampling_factor], jnp.int32)
        enc_params = enc_mod.init(k_enc, dummy_feats, dummy_lens)["params"]
        return {
            "encoder": enc_params,
            "predictor": init_pred_params(k_pred, cfg, dtype),
            "joint": init_joint_params(k_joint, cfg, dtype),
        }

    # -- apply functions (pure; all jit/pjit-compatible) --------------------
    def encode(self, params: Params, features: jax.Array,
               feat_lens: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """[B, n_mels, T] -> ([B, T', d_enc], [B] int32)."""
        return ConformerEncoder(self.config).apply(
            {"params": params["encoder"]}, features, feat_lens)

    def predict_step(self, params: Params, tokens: jax.Array, state):
        return pred_step(params["predictor"], self.config, tokens, state)

    def predict_forward(self, params: Params, targets: jax.Array, state):
        return pred_forward(params["predictor"], self.config, targets, state)

    def joint_step(self, params: Params, enc_frame: jax.Array,
                   pred_out: jax.Array) -> jax.Array:
        return joint_step(params["joint"], enc_frame, pred_out)

    def joint_precompute_enc(self, params: Params,
                             enc: jax.Array) -> jax.Array:
        from .decoder_joint import joint_precompute_enc
        return joint_precompute_enc(params["joint"], enc)

    def joint_step_pre(self, params: Params, enc_pre_frame: jax.Array,
                       pred_out: jax.Array) -> jax.Array:
        from .decoder_joint import joint_step_pre
        return joint_step_pre(params["joint"], enc_pre_frame, pred_out)

    def joint_full(self, params: Params, enc: jax.Array,
                   pred: jax.Array) -> jax.Array:
        return joint_full(params["joint"], enc, pred)

    def init_state(self, batch: int, dtype=jnp.float32):
        return init_pred_state(batch, self.config, dtype)

    # -- checkpoint io ------------------------------------------------------
    def save_checkpoint(self, path: str, params: Params) -> None:
        import os

        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckpt:
            # orbax rejects relative paths; resolve so callers don't have to
            ckpt.save(os.path.abspath(path), params, force=True)

    def load_checkpoint(self, path: str,
                        like: Optional[Params] = None) -> Params:
        import os

        import orbax.checkpoint as ocp
        if like is None:
            like = jax.eval_shape(
                lambda: self.init(jax.random.PRNGKey(0)))
        with ocp.StandardCheckpointer() as ckpt:
            return ckpt.restore(os.path.abspath(path), like)

    def param_count(self, params: Params) -> int:
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
