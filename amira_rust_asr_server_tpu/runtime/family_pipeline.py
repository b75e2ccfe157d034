"""Serving pipelines for the CTC and AED model families.

The reference serves exactly one model family (RNN-T transducer,
ref: src/asr/pipeline.rs:21-67). This framework trains and decodes
three (models/transducer.py, models/ctc.py, models/aed.py); this module
makes the other two first-class SERVED families — the full HTTP surface
(validation, admission, continuous batcher, metrics, hot reload) over
the same bucketed-jit execution model, selected by
``Config.model_family``.

Design: subclass :class:`AsrPipeline` and replace only the decode
core.  All the serving machinery the batcher and handlers rely on —
shape buckets, staging pools, warmup supervision, `_fwd` jit with
params-as-arguments (reload compatibility), transcription assembly —
is family-agnostic; what differs is the traced forward:

* **CTC**: encoder → dense head → log-softmax → fused best-path
  collapse (`ops/ctc.py:ctc_greedy_decode_timed`, one XLA program, no
  decode loop at all — the cheapest family per audio-second).  Beam
  mode runs the batched prefix beam search (`ops/ctc_beam.py`) with
  the same TokenTrie decoding-graph support as the transducer path.
* **AED**: encoder → KV-cached autoregressive attention decoder
  (`models/aed.py:decode_greedy_cached`, exact, O(U·D²)).  Beam mode
  is the batched length-normalized search with its n-best surface.

Both families are stateless across calls (CTC has no decoder state;
AED conditions on the full utterance), so WebSocket streaming — whose
contract is carried decoder state — stays transducer-only and is
rejected up front by the handler (server/app.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import Config
from ..errors import InvalidAudioFormatError
from ..ops import log_mel_features
from ..ops.greedy import GreedyResult
from ..vocab import Vocabulary
from .pipeline import AsrPipeline


def _enc_lens_rule(feat_lens, subsampling_factor: int):
    """Ceil-div through the stride-2 stack — must mirror
    models/encoder.py:284-288 exactly."""
    lens = feat_lens
    s = subsampling_factor
    while s > 1:
        lens = (lens + 1) // 2
        s //= 2
    return lens.astype(jnp.int32)


class _FamilyBeamResult:
    """Adapter matching what the batcher consumes from a transducer
    BeamResult (runtime/batcher.py:319-329): best-hypothesis ``tokens``
    [B, L] / ``counts`` [B] plus an ``n_best`` list of per-lane
    (score, token_list) rows, best-first."""

    def __init__(self, tokens, counts, scores, n_best_rows):
        self.tokens = tokens
        self.counts = counts
        self.scores = scores
        self.n_best = n_best_rows


class CTCPipeline(AsrPipeline):
    """CTC family on the full serving surface."""

    family = "ctc"

    def _fresh_pred(self):
        # CTC has no prediction network; the serving plumbing still
        # carries (state, pred_out) arrays so the jit signature matches
        # the bucketed call in decode_samples_batch — zeros, shaped by
        # the shared ModelConfig contract dims, passed through untouched
        if not hasattr(self, "_fresh_cache"):
            mcfg = self.model.config
            out = np.zeros((1, mcfg.d_pred), np.float32)
            h = np.zeros((mcfg.pred_layers, 1, mcfg.d_pred), np.float32)
            self._fresh_cache = (out, (h, h.copy()))
        return self._fresh_cache

    def _features(self, audio, audio_lens):
        mcfg = self.model.config
        if self.config.use_pallas_mel and jax.default_backend() == "tpu":
            from ..ops.pallas.mel_kernel import log_mel_features_pallas
            return log_mel_features_pallas(audio, audio_lens,
                                           n_mels=mcfg.n_mels)
        return log_mel_features(audio, audio_lens, n_mels=mcfg.n_mels)

    def _forward(self, params, pred_quant, audio, audio_lens, state,
                 pred_out, last_token, token_offset, *, max_symbols,
                 max_total):
        from ..ops.ctc import ctc_greedy_decode_timed
        mcfg = self.model.config
        dt = self.compute_dtype
        feats, feat_lens = self._features(audio, audio_lens)
        enc, enc_lens = self.model.encode(params, feats.astype(dt),
                                          feat_lens)
        logp = self.model.log_probs(params, enc.astype(jnp.float32))
        tokens, counts, frames, confs = ctc_greedy_decode_timed(
            logp, enc_lens, mcfg.blank_id)
        # the per-call token budget still applies (reference parity:
        # MAX_TOTAL_TOKENS, constants.rs:136) — CTC can emit at most one
        # token per encoder frame, so only long audio can hit it
        counts = jnp.minimum(counts, max_total)
        res = GreedyResult(tokens=tokens, counts=counts, frame_idx=frames,
                           confidence=confs, state=state,
                           pred_out=pred_out, last_token=last_token)
        return res, feat_lens, enc_lens

    def _warm_one(self, b: int, n_samples: int) -> None:
        # the base beam branch traces the TRANSDUCER _beam_forward
        # (joint_precompute_enc etc.) — warm through this family's own
        # beam core instead, pinned to the NATURAL bucket (the dispatch
        # path's warm-bucket redirect would route a cold small bucket to
        # an already-warm larger one and never compile the target);
        # greedy warmup is family-agnostic (base class)
        if self.config.decoding_mode == "beam":
            nb = self._bucket_len(n_samples)
            bb = self._bucket_batch(b)
            silence = [np.zeros((min(n_samples, nb),), np.float32)
                       for _ in range(bb)]
            self._beam_core(silence, bb, nb)
            return
        super()._warm_one(b, n_samples)

    def decode_beam_batch(self, samples: Sequence[np.ndarray], *,
                          bias=None, graph=None, n_best: int = 1):
        """Prefix beam search over the same shape buckets."""
        b_real = len(samples)
        if b_real == 0:
            raise InvalidAudioFormatError("empty batch")
        n = self._bucket_len(max(s.shape[0] for s in samples))
        b = self._bucket_batch_warm(b_real, n, "beam")
        return self._beam_core(samples, b, n, bias=bias, graph=graph,
                               n_best=n_best)

    def _beam_core(self, samples: Sequence[np.ndarray], b: int, n: int, *,
                   bias=None, graph=None, n_best: int = 1):
        from ..ops.ctc_beam import ctc_beam_decode
        cfg = self.config
        self.last_decode_path = "ctc_prefix_beam"
        b_real = len(samples)
        audio = np.zeros((b, n), np.float32)
        lens = np.zeros((b,), np.int32)
        for i, s in enumerate(samples):
            m = min(s.shape[0], n)
            audio[i, :m] = s[:m]
            lens[i] = m
        g = graph if graph is not None else self.beam_graph

        if not hasattr(self, "_ctc_beam_fwd"):
            def beam_forward(params, audio, audio_lens):
                dt = self.compute_dtype
                feats, feat_lens = self._features(audio, audio_lens)
                enc, enc_lens = self.model.encode(
                    params, feats.astype(dt), feat_lens)
                logp = self.model.log_probs(params,
                                            enc.astype(jnp.float32))
                return logp, feat_lens, enc_lens
            self._ctc_beam_fwd = jax.jit(beam_forward)
        logp, feat_lens, enc_lens = self._ctc_beam_fwd(
            self.params, jnp.asarray(audio), jnp.asarray(lens))
        bres = ctc_beam_decode(
            logp, enc_lens, self.model.config.blank_id,
            width=cfg.beam_width, max_tokens=cfg.max_total_tokens,
            graph=g, bias=bias)
        self._mark_compiled("beam", b, n)
        toks = np.asarray(bres.tokens)        # [B, K, L] best-first
        cnts = np.asarray(bres.counts)
        scrs = np.asarray(bres.scores)
        n_best_rows: List[List] = []
        for i in range(b_real):
            order = np.argsort(-scrs[i])[:max(1, n_best)]
            n_best_rows.append([
                (float(scrs[i, k]),
                 [int(t) for t in toks[i, k, :int(cnts[i, k])]])
                for k in order])
        best = np.argmax(scrs, axis=1)
        rows = np.arange(toks.shape[0])
        res = _FamilyBeamResult(
            tokens=toks[rows, best], counts=cnts[rows, best],
            scores=scrs[rows, best],
            n_best_rows=n_best_rows if n_best > 1 else None)
        return (res, [int(x) for x in np.asarray(feat_lens)[:b_real]],
                [int(x) for x in np.asarray(enc_lens)[:b_real]])


class AEDPipeline(CTCPipeline):
    """AED family on the full serving surface (shares the CTC plumbing:
    stateless, no prediction network)."""

    family = "aed"

    def _forward(self, params, pred_quant, audio, audio_lens, state,
                 pred_out, last_token, token_offset, *, max_symbols,
                 max_total):
        mcfg = self.model.config
        dt = self.compute_dtype
        feats, feat_lens = self._features(audio, audio_lens)
        # decode_greedy_cached encodes internally; AED is documented as
        # the non-hot family (models/aed.py decode_beam docstring), so
        # the encoder isn't factored out of its fori_loop program here
        max_len = min(int(max_total), C.MAX_TOTAL_TOKENS)
        toks, counts = self.model.decode_greedy_cached(
            params, feats.astype(dt), feat_lens, max_len=max_len)
        enc_lens = _enc_lens_rule(feat_lens, mcfg.subsampling_factor)
        zeros_i = jnp.zeros(toks.shape, jnp.int32)
        # attention decoders have no frame-synchronous alignment, so
        # per-token timestamps/confidences are not defined on this path
        # (the transducer family provides them)
        zeros_f = jnp.zeros(toks.shape, jnp.float32)
        res = GreedyResult(tokens=toks.astype(jnp.int32),
                           counts=counts.astype(jnp.int32),
                           frame_idx=zeros_i, confidence=zeros_f,
                           state=state, pred_out=pred_out,
                           last_token=last_token)
        return res, feat_lens, enc_lens

    def _beam_core(self, samples: Sequence[np.ndarray], b: int, n: int, *,
                   bias=None, graph=None, n_best: int = 1):
        cfg = self.config
        self.last_decode_path = "aed_beam"
        b_real = len(samples)
        audio = np.zeros((b, n), np.float32)
        lens = np.zeros((b,), np.int32)
        for i, s in enumerate(samples):
            m = min(s.shape[0], n)
            audio[i, :m] = s[:m]
            lens[i] = m

        if not hasattr(self, "_aed_beam_fwd"):
            def beam_forward(params, audio, audio_lens, *, beam_width,
                             max_len):
                dt = self.compute_dtype
                feats, feat_lens = self._features(audio, audio_lens)
                toks, counts, scores = self.model.decode_beam(
                    params, feats.astype(dt), feat_lens,
                    width=beam_width, max_len=max_len,
                    length_penalty=0.6, return_all=True)
                enc_lens = _enc_lens_rule(
                    feat_lens, self.model.config.subsampling_factor)
                return toks, counts, scores, feat_lens, enc_lens
            self._aed_beam_fwd = jax.jit(
                beam_forward, static_argnames=("beam_width", "max_len"))
        max_len = min(int(cfg.max_total_tokens), C.MAX_TOTAL_TOKENS)
        toks, counts, scores, feat_lens, enc_lens = self._aed_beam_fwd(
            self.params, jnp.asarray(audio), jnp.asarray(lens),
            beam_width=cfg.beam_width, max_len=max_len)
        self._mark_compiled("beam", b, n)
        toks = np.asarray(toks)       # [B, K, L] best-first (return_all)
        cnts = np.asarray(counts)
        scrs = np.asarray(scores)
        n_best_rows = [[
            (float(scrs[i, k]),
             [int(t) for t in toks[i, k, :int(cnts[i, k])]])
            for k in range(min(max(1, n_best), toks.shape[1]))]
            for i in range(b_real)]
        res = _FamilyBeamResult(
            tokens=toks[:, 0], counts=cnts[:, 0], scores=scrs[:, 0],
            n_best_rows=n_best_rows if n_best > 1 else None)
        return (res, [int(x) for x in np.asarray(feat_lens)[:b_real]],
                [int(x) for x in np.asarray(enc_lens)[:b_real]])


def build_family_pipeline(family: str, preset: str, vocab: Vocabulary,
                          cfg: Config, mesh=None, rng_seed: int = 0):
    """Construct (model, params, pipeline) for a serving family.

    The transducer family goes through the standard AsrPipeline; "ctc"
    and "aed" get their subclasses.  Checkpoint loading, sharding and
    dtype handling ride the shared AsrPipeline init path.
    """
    import dataclasses
    if family == "ctc":
        from ..models.ctc import CTCModel
        model = CTCModel.from_preset(preset)
        cls = CTCPipeline
    elif family == "aed":
        from ..models.aed import AEDModel
        model = AEDModel.from_preset(preset)
        cls = AEDPipeline
    else:
        raise ValueError(f"unknown model family {family!r}")
    # transducer-only serving knobs that reference params["predictor"]
    # or the Pallas RNN-T decode loop must be off for these families
    cfg = dataclasses.replace(cfg, int8_decode_weights=False)
    params = jax.jit(model.init)(jax.random.PRNGKey(rng_seed))
    if cfg.checkpoint_path:
        params = model.load_checkpoint(cfg.checkpoint_path, like=params)
    return model, params, cls(model, params, vocab, cfg, mesh=mesh)
