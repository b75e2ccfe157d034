"""CTC model family: shared conformer encoder + linear vocab head.

Additive beyond the reference (which serves only RNN-T; SURVEY §2.3):
a second model family proving the serving stack's model-agnostic
contract — encoder frames in, per-frame token decisions out, no
prediction network and no autoregressive loop, so batch decode is a
single fused forward (argmax + collapse inside the same XLA program).

Shares ConformerEncoder and ModelConfig with the transducer: a CTC
checkpoint is {"encoder": <same pytree>, "head": {w, b}}, and encoder
weights are interchangeable between the families (e.g. CTC pre-training
then transducer fine-tuning).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .encoder import ConformerEncoder
from .presets import ModelConfig, get_preset

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CTCModel:
    """Stateless model definition; parameters live in an external pytree."""

    config: ModelConfig

    @classmethod
    def from_preset(cls, name: str) -> "CTCModel":
        return cls(get_preset(name))

    def init(self, rng: jax.Array, dtype=jnp.float32) -> Params:
        k_enc, k_head = jax.random.split(rng)
        cfg = self.config
        enc_mod = ConformerEncoder(cfg)
        dummy_feats = jnp.zeros((1, cfg.n_mels, 2 * cfg.subsampling_factor),
                                dtype)
        dummy_lens = jnp.array([2 * cfg.subsampling_factor], jnp.int32)
        enc_params = enc_mod.init(k_enc, dummy_feats, dummy_lens)["params"]
        scale = 1.0 / jnp.sqrt(jnp.asarray(cfg.d_enc, dtype))
        return {
            "encoder": enc_params,
            "head": {
                "w": jax.random.normal(
                    k_head, (cfg.d_enc, cfg.vocab_size), dtype) * scale,
                "b": jnp.zeros((cfg.vocab_size,), dtype),
            },
        }

    # -- apply functions (pure; jit/pjit-compatible) -------------------------
    def encode(self, params: Params, features: jax.Array,
               feat_lens: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """[B, n_mels, T] -> ([B, T', d_enc], [B] int32)."""
        return ConformerEncoder(self.config).apply(
            {"params": params["encoder"]}, features, feat_lens)

    def logits(self, params: Params, enc: jax.Array) -> jax.Array:
        """[B, T', d_enc] -> [B, T', vocab_size]."""
        h = params["head"]
        return jnp.einsum("btd,dv->btv", enc, h["w"]) + h["b"]

    def log_probs(self, params: Params, enc: jax.Array) -> jax.Array:
        return jax.nn.log_softmax(self.logits(params, enc), axis=-1)

    def decode_greedy(self, params: Params, features: jax.Array,
                      feat_lens: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
        """Fused forward + best-path decode: (tokens [B,T'] blank-padded
        left-packed, counts [B]). One XLA program end to end."""
        from ..ops.ctc import ctc_greedy_decode
        enc, enc_lens = self.encode(params, features, feat_lens)
        return ctc_greedy_decode(
            self.log_probs(params, enc), enc_lens, self.config.blank_id)

    def decode_beam(self, params: Params, features: jax.Array,
                    feat_lens: jax.Array, *, width: int = 8,
                    graph=None, bias=None, strict: bool = True):
        """Fused forward + prefix beam search (ops/ctc_beam.py): returns
        CtcBeamResult (tokens [B,K,L], counts [B,K], scores [B,K]).
        Accepts the same weighted TokenTrie decoding graphs as the
        transducer beam (incl. OpenFST-text assets via ops/fst_io.py)."""
        from ..ops.ctc_beam import ctc_beam_decode
        enc, enc_lens = self.encode(params, features, feat_lens)
        return ctc_beam_decode(
            self.log_probs(params, enc), enc_lens, self.config.blank_id,
            width=width, graph=graph, bias=bias, strict=strict)

    def loss(self, params: Params, features: jax.Array,
             feat_lens: jax.Array, labels: jax.Array,
             label_lens: jax.Array) -> jax.Array:
        """Mean per-example CTC negative log-likelihood."""
        from ..ops.ctc import ctc_loss
        enc, enc_lens = self.encode(params, features, feat_lens)
        losses = ctc_loss(self.log_probs(params, enc), enc_lens,
                          labels, label_lens, self.config.blank_id)
        return losses.mean()

    # -- checkpoint io ------------------------------------------------------
    def save_checkpoint(self, path: str, params: Params) -> None:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckpt:
            ckpt.save(os.path.abspath(path), params, force=True)

    def load_checkpoint(self, path: str,
                        like: Optional[Params] = None) -> Params:
        import orbax.checkpoint as ocp
        if like is None:
            like = jax.eval_shape(
                lambda: self.init(jax.random.PRNGKey(0)))
        with ocp.StandardCheckpointer() as ckpt:
            return ckpt.restore(os.path.abspath(path), like)

    def param_count(self, params: Params) -> int:
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
