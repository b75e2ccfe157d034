"""Streaming beam search: carried beam hypotheses across native chunks.

Parity-plus over the reference: its k2 beam backend decodes whole
requests only (ref: src/triton_backends/k2_decoder/k2_decoder_backend.cc
:63-253, batch endpoint), and its streaming path re-decodes chunk
overlaps and weaves transcripts (ref: src/asr/incremental.rs:37-298).
Here the beam search itself is stateful: one fused device program per
chunk runs cached causal encoding + a beam scan seeded from the carried
:class:`~..ops.beam.BeamCarry`, so K hypotheses (scores, prediction-net
states, decoding-graph states) survive chunk boundaries bit-for-bit —
chunked search equals whole-utterance search exactly
(tests/test_beam_stream.py).

Host-side bookkeeping per chunk: the device trace re-parents each of the
K pool hypotheses onto a chunk-start hypothesis (backtrace_carry), and
token histories are spliced accordingly. Two transcript views:

- ``partial()`` — current best hypothesis (may retract when the beam
  leader changes; mark these volatile to clients)
- ``stable()`` — longest common prefix of all live hypotheses (grows
  append-only in practice; never ahead of any surviving hypothesis)

Scores are renormalized per chunk (per-lane max shift, ranking-invariant)
to keep f32 headroom on unbounded sessions; the cumulative shift is
tracked on host so reported scores remain true log-probs.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..models.transducer import Transducer
from ..ops.beam import (BeamCarry, NEG_INF, backtrace_carry,
                        beam_carry_init, beam_decode)
from ..ops.streaming import encode_chunk, init_encoder_cache
from ..types import Transcription
from ..vocab import Vocabulary
from .native_stream import StreamingFeaturizer


class StreamingBeamSession:
    """One stream's beam-mode native pipeline; device state stays in HBM."""

    def __init__(self, model: Transducer, params, vocab: Vocabulary,
                 chunk_frames: int = 64, norm: str = "stream",
                 beam_width: int = C.DEFAULT_BEAM_WIDTH,
                 max_expansions: int = C.BEAM_MAX_EXPANSIONS,
                 bias: Optional[jax.Array] = None,
                 graph=None, length_penalty: float = 0.0):
        cfg = model.config
        assert cfg.causal, "streaming beam requires a causal model preset"
        assert chunk_frames % cfg.subsampling_factor == 0
        self.model = model
        self.params = params
        self.vocab = vocab
        self.cfg = cfg
        self.chunk_frames = chunk_frames
        self.beam_width = beam_width
        self.max_expansions = max_expansions
        self.length_penalty = length_penalty
        self.featurizer = StreamingFeaturizer(cfg.n_mels, norm)
        leaf = jax.tree_util.tree_leaves(params["encoder"])[0]
        self._dtype = leaf.dtype
        self._bias = bias
        self._graph = graph

        # ONE fused program per chunk: cached causal encode + enc-proj
        # hoist + seeded beam scan, params/bias/graph as traced args
        # (closure constants would bake the model into the HLO).
        def chunk_step(p, feats, cache, enc_lens, carry, bias_v, graph_t):
            enc, cache2 = encode_chunk(p["encoder"], cfg, feats, cache)
            enc_pre = model.joint_precompute_enc(p, enc)
            trace, carry2 = beam_decode(
                partial(model.predict_step, p),
                partial(model.joint_step_pre, p),
                enc_pre, enc_lens, None, cfg.blank_id,
                beam_width=beam_width, max_expansions=max_expansions,
                bias=bias_v, vocab_size=cfg.vocab_size, graph=graph_t,
                init_beam=carry, return_carry=True)
            # per-lane max shift keeps f32 headroom on long sessions;
            # returned so the host tracks true cumulative log-probs
            shift = jnp.max(carry2.scores, axis=1, keepdims=True)
            carry2 = dataclasses.replace(carry2,
                                         scores=carry2.scores - shift)
            return cache2, trace, carry2, shift[:, 0]

        self._step = jax.jit(chunk_step, donate_argnums=(2,))
        self._init_carry = jax.jit(
            lambda p: beam_carry_init(
                partial(model.predict_step, p),
                model.init_state(1, self._dtype), cfg.blank_id, 1,
                beam_width))

        self.enc_cache = init_encoder_cache(cfg, batch=1, dtype=self._dtype)
        self.carry: Optional[BeamCarry] = None
        self.hists: List[List[int]] = [[] for _ in range(beam_width)]
        self._last_trace = None
        self._score_shift = 0.0
        self.mel_backlog = np.zeros((0, cfg.n_mels), np.float32)
        self.enc_frames = 0

    # ------------------------------------------------------------------
    def feed(self, samples: np.ndarray, final: bool = False) -> str:
        """Feed PCM samples; returns the current best-hypothesis partial."""
        new = self.featurizer.feed(samples, final=final)
        if new.shape[0]:
            self.mel_backlog = np.concatenate([self.mel_backlog, new],
                                              axis=0)
        while self.mel_backlog.shape[0] >= self.chunk_frames or (
                final and self.mel_backlog.shape[0] > 0):
            take = min(self.chunk_frames, self.mel_backlog.shape[0])
            chunk = self.mel_backlog[:self.chunk_frames]
            real = chunk.shape[0]
            if real < self.chunk_frames:
                chunk = np.concatenate(
                    [chunk, np.zeros((self.chunk_frames - real,
                                      chunk.shape[1]), np.float32)])
            self.mel_backlog = self.mel_backlog[take:]
            self._process_chunk(chunk, real)
            if final and self.mel_backlog.shape[0] == 0:
                break
        return self.partial()

    def _process_chunk(self, chunk: np.ndarray, real_frames: int) -> None:
        cfg = self.cfg
        feats = self.featurizer.normalize(chunk)
        feats_dev = jnp.asarray(feats.T[None], self._dtype)  # [1, M, Tc]
        n_enc = -(-real_frames // cfg.subsampling_factor)
        if self.carry is None:
            self.carry = self._init_carry(self.params)
        self.enc_cache, trace, self.carry, shift = self._step(
            self.params, feats_dev, self.enc_cache,
            jnp.array([n_enc], jnp.int32), self.carry, self._bias,
            self._graph)
        self._last_trace = trace
        self._score_shift += float(np.asarray(shift)[0])
        origins, seqs = backtrace_carry(trace, np.array([n_enc]))
        self.hists = [self.hists[int(origins[0, k])] + seqs[0][k]
                      for k in range(self.beam_width)]
        self.enc_frames += n_enc

    # ------------------------------------------------------------------
    def _live_scores(self) -> np.ndarray:
        if self.carry is None:
            return np.full((self.beam_width,), NEG_INF, np.float32)
        return np.asarray(self.carry.scores)[0]

    def best_hyp(self) -> int:
        return int(np.argmax(self._live_scores()))

    def partial(self) -> str:
        """Best current hypothesis (volatile: the leader can change)."""
        if self.carry is None:
            return ""
        return self.vocab.decode_tokens(self.hists[self.best_hyp()])

    def partial_tokens(self) -> List[int]:
        if self.carry is None:
            return []
        return list(self.hists[self.best_hyp()])

    def stable_tokens(self) -> List[int]:
        """Longest common prefix of all live hypotheses — safe to commit."""
        scores = self._live_scores()
        live = [self.hists[k] for k in range(self.beam_width)
                if scores[k] > NEG_INF / 2]
        if not live:
            return []
        prefix = live[0]
        for h in live[1:]:
            n = 0
            for a, b in zip(prefix, h):
                if a != b:
                    break
                n += 1
            prefix = prefix[:n]
            if not prefix:
                break
        return list(prefix)

    def stable(self) -> str:
        return self.vocab.decode_tokens(self.stable_tokens())

    # ------------------------------------------------------------------
    def end(self) -> Transcription:
        """Flush, then judge finality ONCE at end-of-stream: with a
        decoding graph, hypotheses stranded mid-phrase rank below every
        complete one (same demotion as the batch backtrace)."""
        self.feed(np.zeros(0, np.float32), final=True)
        if self.carry is None:
            best, score = 0, 0.0
            tokens: List[int] = []
        else:
            scores = self._live_scores().astype(np.float64)
            if self._last_trace is not None and self._graph is not None:
                final_ok = np.asarray(self._last_trace.pool_final)[0]
                demoted = np.where(final_ok, scores, scores - 1e12)
                # end-of-stream totals include graph final weights
                fw = np.asarray(self._graph.final_weight)
                g = np.asarray(self.carry.g_state)[0]
                lens = np.asarray(self.carry.lens)[0]
                demoted = demoted + np.where(
                    final_ok & (lens > 0), fw[g], 0.0)
                scores = demoted
            if self.length_penalty > 0:
                lens = np.maximum(np.asarray(self.carry.lens)[0], 1)
                best = int(np.argmax(
                    scores / lens ** self.length_penalty))
            else:
                best = int(np.argmax(scores))
            score = float(scores[best]) + self._score_shift
            tokens = list(self.hists[best])
        return Transcription(
            text=self.vocab.decode_tokens(tokens), tokens=tokens,
            audio_length_samples=self.featurizer.samples_fed,
            features_length=self.featurizer._frames_emitted,
            encoded_length=self.enc_frames,
            score=score if self.carry is not None else None)
