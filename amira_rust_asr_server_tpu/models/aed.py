"""Attention-decoder (AED / LAS-style) model family.

Third model family beyond the reference's RNN-T (SURVEY §2.3 serves
transducer only; CTCModel added the second): the shared conformer
encoder plus a transformer decoder with causal self-attention and
cross-attention over encoder frames, trained with teacher-forced
cross-entropy. Completes the standard ASR head trio (transducer / CTC /
attention) on one encoder contract — encoder pytrees are interchangeable
across all three families (e.g. AED pre-training, transducer serving).

Design notes (TPU-first, same conventions as the siblings):
- Plain functions over explicit param pytrees (decoder_joint.py's
  rationale) — jit/pjit/vmap-compatible, no framework indirection in
  the decode loop.
- Static shapes everywhere: the greedy decoder runs a
  ``lax.fori_loop`` over a fixed ``max_len`` buffer, re-running the
  (causally masked) full decoder forward each step. That is O(U^2) in
  decoded length — correct and compiler-friendly first; a KV-cached
  incremental step is the known follow-up if AED ever becomes a hot
  serving path (the transducer remains the production family, as in
  the reference).
- Token conventions: ``config.blank_id`` doubles as BOS (decoder input
  position 0, matching the transducer's blank-as-SOS convention in
  decoder_joint.py) and as EOS (the decoder learns to emit it to stop).
  No new vocab entries, so the reference's 1030-logit contract and
  existing vocab.txt files hold unchanged.
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
NEG = -1e9


def _sinusoid(u: int, d: int, dtype=jnp.float32) -> jax.Array:
    """[U, D] sinusoidal position encoding (static-shape, no params)."""
    pos = jnp.arange(u, dtype=jnp.float32)[:, None]
    i = jnp.arange(d // 2, dtype=jnp.float32)[None, :]
    ang = pos / jnp.power(10000.0, 2.0 * i / d)
    pe = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return pe.astype(dtype)


def _ln(x: jax.Array, p: Dict) -> jax.Array:
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]


def _mha(q_in: jax.Array, kv_in: jax.Array, p: Dict, n_heads: int,
         mask: jax.Array) -> jax.Array:
    """Multi-head attention. q_in [B,U,D], kv_in [B,T,*], mask [B?,U,T]
    additive (0 / NEG). Returns [B,U,D]."""
    b, u, d = q_in.shape
    t = kv_in.shape[1]
    h = n_heads
    dh = d // h
    q = (q_in @ p["wq"]).reshape(b, u, h, dh)
    k = (kv_in @ p["wk"]).reshape(b, t, h, dh)
    v = (kv_in @ p["wv"]).reshape(b, t, h, dh)
    logits = jnp.einsum("buhd,bthd->bhut", q, k) / jnp.sqrt(
        jnp.asarray(dh, q.dtype))
    logits = logits + mask[:, None, :, :] if mask.ndim == 3 \
        else logits + mask[None, None, :, :]
    att = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhut,bthd->buhd", att, v).reshape(b, u, d)
    return out @ p["wo"]


@dataclasses.dataclass(frozen=True)
class AEDModel:
    """Stateless model definition; parameters live in an external pytree.

    Decoder hyperparameters ride on the model object (not ModelConfig),
    so presets and existing checkpoints are untouched; ``d_dec=0``
    defaults to ``min(d_enc, 512)``.
    """

    config: ModelConfig
    dec_layers: int = 2
    dec_heads: int = 4
    d_dec: int = 0

    @classmethod
    def from_preset(cls, name: str, **kw) -> "AEDModel":
        return cls(get_preset(name), **kw)

    @property
    def d(self) -> int:
        return self.d_dec or min(self.config.d_enc, 512)

    # -- init ----------------------------------------------------------------
    def init(self, rng: jax.Array, dtype=jnp.float32) -> Params:
        cfg = self.config
        d, v = self.d, cfg.vocab_size
        k_enc, k_dec = jax.random.split(rng)
        enc_mod = ConformerEncoder(cfg)
        dummy_feats = jnp.zeros((1, cfg.n_mels, 2 * cfg.subsampling_factor),
                                dtype)
        dummy_lens = jnp.array([2 * cfg.subsampling_factor], jnp.int32)
        enc_params = enc_mod.init(k_enc, dummy_feats, dummy_lens)["params"]

        def dense(k, n_in, n_out):
            return jax.random.normal(k, (n_in, n_out), dtype) / jnp.sqrt(
                jnp.asarray(n_in, dtype))

        keys = iter(jax.random.split(k_dec, 2 + 12 * self.dec_layers))
        layers = []
        for _ in range(self.dec_layers):
            layers.append({
                "ln1": {"g": jnp.ones((d,), dtype),
                        "b": jnp.zeros((d,), dtype)},
                "self": {"wq": dense(next(keys), d, d),
                         "wk": dense(next(keys), d, d),
                         "wv": dense(next(keys), d, d),
                         "wo": dense(next(keys), d, d)},
                "ln2": {"g": jnp.ones((d,), dtype),
                        "b": jnp.zeros((d,), dtype)},
                "cross": {"wq": dense(next(keys), d, d),
                          "wk": dense(next(keys), cfg.d_enc, d),
                          "wv": dense(next(keys), cfg.d_enc, d),
                          "wo": dense(next(keys), d, d)},
                "ln3": {"g": jnp.ones((d,), dtype),
                        "b": jnp.zeros((d,), dtype)},
                "ff": {"w1": dense(next(keys), d, 4 * d),
                       "b1": jnp.zeros((4 * d,), dtype),
                       "w2": dense(next(keys), 4 * d, d),
                       "b2": jnp.zeros((d,), dtype)},
            })
        return {
            "encoder": enc_params,
            "decoder": {
                "embed": dense(next(keys), v, d) * jnp.sqrt(
                    jnp.asarray(d, dtype)),
                "layers": layers,
                "ln_out": {"g": jnp.ones((d,), dtype),
                           "b": jnp.zeros((d,), dtype)},
                "out": {"w": dense(next(keys), d, v),
                        "b": jnp.zeros((v,), dtype)},
            },
        }

    # -- apply ----------------------------------------------------------------
    def encode(self, params: Params, features: jax.Array,
               feat_lens: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """[B, n_mels, T] -> ([B, T', d_enc], [B] int32)."""
        return ConformerEncoder(self.config).apply(
            {"params": params["encoder"]}, features, feat_lens)

    def decoder_logits(self, params: Params, dec_in: jax.Array,
                       enc: jax.Array, enc_lens: jax.Array) -> jax.Array:
        """Teacher-forced decoder forward.

        dec_in [B, U] token ids (position 0 is BOS=blank), enc
        [B, T, d_enc] -> logits [B, U, vocab]. Causal over U,
        cross-attention masked to valid encoder frames.
        """
        p = params["decoder"]
        b, u = dec_in.shape
        t = enc.shape[1]
        x = p["embed"][dec_in] + _sinusoid(u, self.d, p["embed"].dtype)
        causal = jnp.where(
            jnp.arange(u)[:, None] >= jnp.arange(u)[None, :], 0.0, NEG)
        enc_mask = jnp.where(
            jnp.arange(t)[None, None, :] < enc_lens[:, None, None],
            0.0, NEG)                                      # [B, 1, T]
        enc_mask = jnp.broadcast_to(enc_mask, (b, u, t))
        for lp in p["layers"]:
            x = x + _mha(_ln(x, lp["ln1"]), _ln(x, lp["ln1"]),
                         lp["self"], self.dec_heads, causal)
            x = x + _mha(_ln(x, lp["ln2"]), enc, lp["cross"],
                         self.dec_heads, enc_mask)
            h = _ln(x, lp["ln3"])
            h = jax.nn.gelu(h @ lp["ff"]["w1"] + lp["ff"]["b1"])
            x = x + (h @ lp["ff"]["w2"] + lp["ff"]["b2"])
        x = _ln(x, p["ln_out"])
        return x @ p["out"]["w"] + p["out"]["b"]

    def loss(self, params: Params, features: jax.Array,
             feat_lens: jax.Array, labels: jax.Array,
             label_lens: jax.Array) -> jax.Array:
        """Mean per-token teacher-forced cross-entropy.

        Targets are ``labels`` with EOS(=blank) appended at position
        ``label_lens``; decoder input is [BOS, labels[:-1]] shifted.
        """
        cfg = self.config
        enc, enc_lens = self.encode(params, features, feat_lens)
        b, u_lab = labels.shape
        u = u_lab + 1
        bos = jnp.full((b, 1), cfg.blank_id, jnp.int32)
        dec_in = jnp.concatenate([bos, labels.astype(jnp.int32)], axis=1)
        pos = jnp.arange(u)[None, :]
        targets = jnp.where(
            pos < label_lens[:, None],
            jnp.pad(labels, ((0, 0), (0, 1))),
            cfg.blank_id).astype(jnp.int32)                # EOS at len
        valid = (pos <= label_lens[:, None]).astype(jnp.float32)
        logp = jax.nn.log_softmax(
            self.decoder_logits(params, dec_in, enc, enc_lens), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], -1)[..., 0]
        return (nll * valid).sum() / jnp.maximum(valid.sum(), 1.0)

    def decode_greedy(self, params: Params, features: jax.Array,
                      feat_lens: jax.Array, *, max_len: int = 64
                      ) -> Tuple[jax.Array, jax.Array]:
        """Fused forward + greedy autoregressive decode.

        Returns (tokens [B, max_len] EOS/blank-padded, counts [B]).
        One jittable program: ``fori_loop`` over a static [B, max_len+1]
        buffer, full causally-masked forward per step (see module notes
        on the O(U^2) trade)."""
        cfg = self.config
        enc, enc_lens = self.encode(params, features, feat_lens)
        b = enc.shape[0]
        buf = jnp.full((b, max_len + 1), cfg.blank_id, jnp.int32)  # BOS @0
        done0 = jnp.zeros((b,), bool)

        def step(u, carry):
            buf, done = carry
            logits = self.decoder_logits(params, buf, enc, enc_lens)
            nxt = jnp.argmax(logits[:, u], axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, cfg.blank_id, nxt)
            done = done | (nxt == cfg.blank_id)
            buf = jax.lax.dynamic_update_index_in_dim(buf, nxt, u + 1, 1)
            return buf, done

        buf, _ = jax.lax.fori_loop(0, max_len, step, (buf, done0))
        toks = buf[:, 1:]
        is_tok = toks != cfg.blank_id
        # count = tokens before the first EOS
        first_eos = jnp.argmin(is_tok, axis=1)
        counts = jnp.where(is_tok.all(axis=1), max_len, first_eos)
        return toks, counts.astype(jnp.int32)

    def sequence_scores(self, params: Params, features: jax.Array,
                        feat_lens: jax.Array, tokens: jax.Array,
                        counts: jax.Array) -> jax.Array:
        """Teacher-forced total log-prob of given sequences, INCLUDING
        the EOS emission at position ``counts`` — the quantity beam
        search maximizes (test oracle: beam best >= greedy's score)."""
        cfg = self.config
        enc, enc_lens = self.encode(params, features, feat_lens)
        b, u_lab = tokens.shape
        bos = jnp.full((b, 1), cfg.blank_id, jnp.int32)
        dec_in = jnp.concatenate([bos, tokens.astype(jnp.int32)], axis=1)
        pos = jnp.arange(u_lab + 1)[None, :]
        targets = jnp.where(pos < counts[:, None],
                            jnp.pad(tokens, ((0, 0), (0, 1))),
                            cfg.blank_id).astype(jnp.int32)
        valid = (pos <= counts[:, None]).astype(jnp.float32)
        logp = jax.nn.log_softmax(
            self.decoder_logits(params, dec_in, enc, enc_lens), axis=-1)
        lp = jnp.take_along_axis(logp, targets[..., None], -1)[..., 0]
        return (lp * valid).sum(axis=1)

    def decode_beam(self, params: Params, features: jax.Array,
                    feat_lens: jax.Array, *, width: int = 4,
                    max_len: int = 64, length_penalty: float = 0.0,
                    return_all: bool = False
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Batched beam search with optional length normalization.

        Returns (tokens [B, max_len], counts [B], scores [B]) for the
        best hypothesis per lane (``scores`` are UN-normalized total
        log-probs incl. EOS; ``length_penalty`` only affects ranking,
        the GNMT-style score/len^alpha convention). One jittable
        program: a ``fori_loop`` over a static [B, K, max_len+1]
        buffer; finished hypotheses persist with frozen scores by
        forcing their next-token distribution to EOS-at-zero-cost.
        Like :meth:`decode_greedy`, re-runs the masked full forward per
        step (AED is not the hot serving family; the KV-cached variant
        of this is the greedy path's follow-up)."""
        cfg = self.config
        eos = cfg.blank_id
        enc, enc_lens = self.encode(params, features, feat_lens)
        b, t = enc.shape[0], enc.shape[1]
        k = width
        v = cfg.vocab_size
        u_max = max_len + 1
        enc_rep = jnp.repeat(enc, k, axis=0)          # [B*K, T, D]
        lens_rep = jnp.repeat(enc_lens, k, axis=0)

        buf0 = jnp.full((b, k, u_max), eos, jnp.int32)   # BOS everywhere
        # hyp 0 is the live empty hypothesis; the rest are -inf slots
        scores0 = jnp.full((b, k), NEG).at[:, 0].set(0.0)
        done0 = jnp.zeros((b, k), bool)
        eos_row = jnp.full((v,), NEG).at[eos].set(0.0)   # frozen-hyp dist

        def step(u, carry):
            buf, scores, done = carry
            logits = self.decoder_logits(
                params, buf.reshape(b * k, u_max), enc_rep, lens_rep)
            logp = jax.nn.log_softmax(logits[:, u], -1).reshape(b, k, v)
            logp = jnp.where(done[..., None], eos_row[None, None, :], logp)
            cand = (scores[..., None] + logp).reshape(b, k * v)
            top, idx = jax.lax.top_k(cand, k)
            parent = idx // v                            # [B, K]
            token = (idx % v).astype(jnp.int32)
            buf = jnp.take_along_axis(buf, parent[..., None], axis=1)
            done = jnp.take_along_axis(done, parent, axis=1)
            buf = jax.lax.dynamic_update_index_in_dim(
                buf, jnp.where(done, eos, token), u + 1, 2)
            done = done | (token == eos)
            return buf, top, done

        buf, scores, done = jax.lax.fori_loop(0, max_len, step,
                                              (buf0, scores0, done0))
        # hypotheses force-terminated at max_len still owe their EOS
        # emission: charge it so every score is a complete sequence
        # log-prob (directly comparable across finished/unfinished, and
        # equal to sequence_scores() on the returned output)
        tail = jax.nn.log_softmax(
            self.decoder_logits(params, buf.reshape(b * k, u_max),
                                enc_rep, lens_rep)[:, max_len],
            -1)[:, eos].reshape(b, k)
        scores = jnp.where(done, scores, scores + tail)
        toks = buf[:, :, 1:]                             # [B, K, max_len]
        is_tok = toks != eos
        first_eos = jnp.argmin(is_tok, axis=2)
        counts = jnp.where(is_tok.all(axis=2), max_len, first_eos)
        ranked = scores / jnp.maximum(counts, 1) ** length_penalty \
            if length_penalty > 0 else scores
        if return_all:
            # all K hypotheses, best-first (n-best surface)
            order = jnp.argsort(-ranked, axis=1)
            gather = lambda x: jnp.take_along_axis(  # noqa: E731
                x, order[:, :, *([None] * (x.ndim - 2))], axis=1)
            return (gather(toks), gather(counts).astype(jnp.int32),
                    gather(scores))
        best = jnp.argmax(ranked, axis=1)
        pick = lambda x: jnp.take_along_axis(  # noqa: E731
            x, best[:, None, *([None] * (x.ndim - 2))], axis=1)[:, 0]
        return (pick(toks), pick(counts).astype(jnp.int32),
                pick(scores))

    def decode_greedy_cached(self, params: Params, features: jax.Array,
                             feat_lens: jax.Array, *, max_len: int = 64
                             ) -> Tuple[jax.Array, jax.Array]:
        """KV-cached greedy decode — token-identical to
        :meth:`decode_greedy`, O(U·D²) instead of O(U²·D²).

        Per layer: self-attention K/V live in static [B, U+1, D]
        buffers written once per step (pre-LN makes position u's K/V
        depend only on tokens ≤ u, so the cache is exact, not an
        approximation); cross-attention K/V are projected from the
        encoder ONCE before the loop. Static shapes + ``fori_loop``
        keep it one XLA program (tests lock equality with the
        uncached decoder).
        """
        cfg = self.config
        enc, enc_lens = self.encode(params, features, feat_lens)
        p = params["decoder"]
        b, t = enc.shape[0], enc.shape[1]
        d, h = self.d, self.dec_heads
        dh = d // h
        u_max = max_len + 1
        pe = _sinusoid(u_max, d, p["embed"].dtype)

        # cross-attention K/V: one projection per layer, reused every step
        cross_kv = [
            ((enc @ lp["cross"]["wk"]).reshape(b, t, h, dh),
             (enc @ lp["cross"]["wv"]).reshape(b, t, h, dh))
            for lp in p["layers"]]
        enc_mask = jnp.where(
            jnp.arange(t)[None, :] < enc_lens[:, None], 0.0, NEG)  # [B, T]

        k0 = jnp.zeros((len(p["layers"]), b, u_max, h, dh),
                       p["embed"].dtype)
        v0 = jnp.zeros_like(k0)
        buf0 = jnp.full((b, u_max), cfg.blank_id, jnp.int32)
        done0 = jnp.zeros((b,), bool)

        def step(u, carry):
            buf, done, kc, vc = carry
            tok = jax.lax.dynamic_index_in_dim(buf, u, 1, keepdims=False)
            x = p["embed"][tok] + jax.lax.dynamic_index_in_dim(
                pe, u, 0, keepdims=False)                       # [B, D]
            pos_mask = jnp.where(jnp.arange(u_max) <= u, 0.0, NEG)
            for li, lp in enumerate(p["layers"]):
                hh = _ln(x, lp["ln1"])
                q = (hh @ lp["self"]["wq"]).reshape(b, h, dh)
                # write this position's K/V into layer li's cache
                k_new = (hh @ lp["self"]["wk"]).reshape(b, h, dh)
                v_new = (hh @ lp["self"]["wv"]).reshape(b, h, dh)
                kc = kc.at[li, :, u].set(k_new)
                vc = vc.at[li, :, u].set(v_new)
                logits = jnp.einsum("bhd,bthd->bht", q, kc[li]) \
                    / jnp.sqrt(jnp.asarray(dh, q.dtype))
                att = jax.nn.softmax(logits + pos_mask[None, None, :], -1)
                sa = jnp.einsum("bht,bthd->bhd", att, vc[li]
                                ).reshape(b, d) @ lp["self"]["wo"]
                x = x + sa
                hh = _ln(x, lp["ln2"])
                q = (hh @ lp["cross"]["wq"]).reshape(b, h, dh)
                ck, cv = cross_kv[li]
                cl = jnp.einsum("bhd,bthd->bht", q, ck) / jnp.sqrt(
                    jnp.asarray(dh, q.dtype))
                catt = jax.nn.softmax(cl + enc_mask[:, None, :], -1)
                ca = jnp.einsum("bht,bthd->bhd", catt, cv
                                ).reshape(b, d) @ lp["cross"]["wo"]
                x = x + ca
                hh = _ln(x, lp["ln3"])
                hh = jax.nn.gelu(hh @ lp["ff"]["w1"] + lp["ff"]["b1"])
                x = x + (hh @ lp["ff"]["w2"] + lp["ff"]["b2"])
            x = _ln(x, p["ln_out"])
            step_logits = x @ p["out"]["w"] + p["out"]["b"]
            nxt = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, cfg.blank_id, nxt)
            done = done | (nxt == cfg.blank_id)
            buf = jax.lax.dynamic_update_index_in_dim(buf, nxt, u + 1, 1)
            return buf, done, kc, vc

        buf, _, _, _ = jax.lax.fori_loop(0, max_len, step,
                                         (buf0, done0, k0, v0))
        toks = buf[:, 1:]
        is_tok = toks != cfg.blank_id
        first_eos = jnp.argmin(is_tok, axis=1)
        counts = jnp.where(is_tok.all(axis=1), max_len, first_eos)
        return toks, counts.astype(jnp.int32)

    # -- checkpoint io --------------------------------------------------------
    def save_checkpoint(self, path: str, params: Params) -> None:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckpt:
            ckpt.save(os.path.abspath(path), params, force=True)

    def load_checkpoint(self, path: str,
                        like: Optional[Params] = None) -> Params:
        import orbax.checkpoint as ocp
        if like is None:
            like = jax.eval_shape(lambda: self.init(jax.random.PRNGKey(0)))
        with ocp.StandardCheckpointer() as ckpt:
            return ckpt.restore(os.path.abspath(path), like)

    def param_count(self, params: Params) -> int:
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
