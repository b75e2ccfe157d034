"""The ASR pipeline: one resident XLA program from waveform to tokens.

API parity with the reference's ``AsrPipeline`` trait
(ref: src/asr/pipeline.rs:21-67 — process_batch / process_batch_samples /
process_stream_chunk / process_stream_samples), but where the reference
orchestrates three Triton gRPC calls plus a host decode loop
(ref: pipeline.rs:269-379), here the whole chain

    log-mel -> conformer encode -> label-looping greedy decode

is a single jitted function per (batch, length) bucket. Requests are
padded into static shape buckets (config.audio_sec_buckets x
config.batch_buckets) so XLA compiles a handful of programs once and
reuses them — the TPU-native replacement for the reference's
connection pool + per-symbol round-trips.

Streaming state (prediction-net h/c, last token) stays on
device between chunks: :class:`StreamState` is the HBM-resident analogue of
the reference's DecoderState (ref: src/asr/types.rs:157-181).
"""

from __future__ import annotations

import dataclasses
import threading
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..audio import pcm16_bytes_to_f32
from ..config import Config
from ..errors import ConfigValidationError, InvalidAudioFormatError
from ..models import Transducer
from ..ops import log_mel_features
from ..ops.greedy import GreedyResult, greedy_decode
from ..types import Transcription
from ..vocab import Vocabulary


@dataclasses.dataclass
class StreamState:
    """Per-stream decode state, resident on device across chunks."""

    state: Tuple[jax.Array, jax.Array]  # prediction-net (h, c) [L, 1, P]
    pred_out: jax.Array                 # [1, P]
    last_token: jax.Array               # [1] int32
    # Session statistic only — NOT a budget. The MAX_TOTAL_TOKENS budget
    # is per decode call, matching the reference (its counter is local to
    # each greedy_decode invocation, ref: src/asr/decoder_optimized.rs:
    # 78-92,229-243), so long streams keep transcribing past 200 tokens.
    tokens_emitted: int = 0


class AsrPipeline:
    """Compiled end-to-end ASR over shape buckets."""

    def __init__(self, model: Transducer, params, vocab: Vocabulary,
                 config: Optional[Config] = None, mesh=None):
        """``mesh``: optional jax.sharding.Mesh — parameters are placed
        with tensor-parallel shardings (parallel.mesh rules) and GSPMD
        partitions every pipeline program across it."""
        self.model = model
        self.vocab = vocab
        self.config = config or Config()
        cfg = self.config
        if cfg.quantization == "int8" and not model.config.quant_int8:
            # serving-only flag flip: param pytree is unchanged, so the
            # already-loaded params apply as-is (encoder.QDense)
            self.model = model = dataclasses.replace(
                model, config=dataclasses.replace(
                    model.config, quant_int8=True))
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import shard_params
            params = shard_params(mesh, params)
        # bf16 serving: params cast once at load; feature extraction stays
        # f32 (DFT precision), activations run bf16 on the MXU
        self.compute_dtype = jnp.bfloat16 \
            if cfg.compute_dtype == "bfloat16" else jnp.float32
        if self.compute_dtype == jnp.bfloat16:
            # one jitted cast: per-leaf .astype would dispatch hundreds of
            # tiny device ops (minutes over a high-latency device link)
            cast = jax.jit(lambda p: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, p))
            params = cast(params)
        self.params = params
        # int8-resident decode kernel: LSTM weights pre-quantized ONCE
        # here (per-output-channel symmetric) and passed as jit arguments
        # ever after — never recomputed per dispatch, never baked into
        # the program (CLAUDE.md: closure params blow up the compile
        # payload)
        self._pred_quant = None
        if (cfg.int8_decode_weights
                and (cfg.use_pallas_decode_loop or cfg.use_pallas_beam_loop)
                and jax.default_backend() == "tpu"):
            from ..ops.pallas.decode_loop import quantize_pred_lstm
            self._pred_quant = jax.jit(quantize_pred_lstm)(
                params["predictor"])
        self._sec_buckets = sorted(cfg.audio_sec_buckets)
        self._batch_buckets = sorted(cfg.batch_buckets)
        # guards _compiled/_staging/_fresh_cache: the dispatch thread and
        # the background warmup thread both touch them
        self._lock = threading.Lock()
        self._compiled: set = set()  # (mode, batch_bucket, len_bucket) seen
        self.warmed_up = False
        # optional observability hook: called once per new bucket program
        # (wired to the prometheus asr_xla_compilations_total counter)
        self.on_compile = None
        # beam decode-path routing observability (kernel vs scan)
        self.on_beam_path = None
        self.decode_path_counts = {"pallas_kernel": 0, "xla_scan": 0}
        self.last_decode_path = None
        self._warmup_thread: Optional[threading.Thread] = None
        self._warmup_stop = threading.Event()
        # host staging-buffer pool: one reusable padded array per bucket
        # (the host-side analogue of the reference's lock-free buffer
        # pools, ref: src/asr/lockfree_memory.rs — here a simple per-bucket
        # cache is enough because dispatch is single-threaded)
        self._staging: dict = {}
        self._fwd = jax.jit(
            self._forward,
            static_argnames=("max_symbols", "max_total"))
        self._beam_fwd = jax.jit(
            self._beam_forward,
            static_argnames=("beam_width", "max_expansions"))
        # optional decoding-graph constraint (k2 parity): a grammar file of
        # phrases compiles once into a device-resident WEIGHTED token trie.
        # Line format: "phrase" or "phrase<TAB>log_weight" (e.g. unigram
        # log-probs) — the weighted-FSA analogue of k2's DECODING_GRAPH_PATH
        # (ref: k2_decoder_backend.cc:63-253). A path ending in
        # .fst/.fst.txt/.fsttxt is instead parsed as an OpenFST-text
        # decoding graph (the reference's actual DECODING_GRAPH_PATH asset
        # format, ref: k2_decoder_backend.cc:96-117) via ops/fst_io.py —
        # epsilon-removed + weight-exact determinized into the same trie.
        self.beam_graph = None
        if cfg.beam_grammar_path and cfg.beam_grammar_path.endswith(
                (".fst", ".fst.txt", ".fsttxt")):
            from ..ops.fst_io import token_trie_from_openfst_file
            self.beam_graph = token_trie_from_openfst_file(
                cfg.beam_grammar_path, self.model.config.vocab_size,
                vocab=vocab)
        elif cfg.beam_grammar_path:
            from ..ops.beam import TokenTrie
            phrases, weights, any_w = [], [], False
            with open(cfg.beam_grammar_path, "r", encoding="utf-8") as f:
                for ln in f:
                    ln = ln.strip()
                    if not ln:
                        continue
                    phrase, sep, w = ln.rpartition("\t")
                    if sep and phrase:
                        # a tab means "phrase<TAB>weight"; a junk weight is
                        # a config error, not a phrase that happens to
                        # contain a tab (silently encoding the raw line
                        # would corrupt the grammar)
                        try:
                            weights.append(float(w))
                        except ValueError:
                            raise ConfigValidationError(
                                f"grammar line {ln!r} in "
                                f"{cfg.beam_grammar_path}: expected "
                                f"'phrase<TAB>log_weight', got non-numeric "
                                f"weight {w!r}") from None
                        phrases.append(phrase.strip())
                        any_w = True
                        continue
                    phrases.append(ln)
                    weights.append(0.0)
            self.beam_graph = TokenTrie.from_phrases(
                vocab, phrases, self.model.config.vocab_size,
                weights=weights if any_w else None)

    # ------------------------------------------------------------------
    # jitted core
    # ------------------------------------------------------------------
    def _forward(self, params, pred_quant, audio, audio_lens, state,
                 pred_out, last_token, token_offset, *, max_symbols,
                 max_total):
        mcfg = self.model.config
        dt = self.compute_dtype
        if self.config.use_pallas_mel and jax.default_backend() == "tpu":
            from ..ops.pallas.mel_kernel import log_mel_features_pallas
            feats, feat_lens = log_mel_features_pallas(
                audio, audio_lens, n_mels=mcfg.n_mels)
        else:
            feats, feat_lens = log_mel_features(
                audio, audio_lens, n_mels=mcfg.n_mels)
        enc, enc_lens = self.model.encode(params, feats.astype(dt),
                                          feat_lens)
        # hoist the joint's encoder projection out of the decode loop
        enc_pre = self.model.joint_precompute_enc(params, enc)
        state = jax.tree_util.tree_map(lambda x: x.astype(dt), state)
        on_tpu = jax.default_backend() == "tpu"
        if self.config.use_pallas_decode_loop and on_tpu:
            # the whole label-looping loop in one persistent kernel:
            # prediction-net + joint weights stay VMEM-resident across
            # iterations instead of re-streaming ~15 MB from HBM per
            # emitted symbol (ops/pallas/decode_loop.py)
            from ..ops.pallas.decode_loop import greedy_loop_pallas
            tokens, counts, frames, confs, st, p_out, last = \
                greedy_loop_pallas(
                    enc_pre, enc_lens, state[0], state[1],
                    pred_out.astype(dt), last_token, token_offset,
                    params["predictor"], params["joint"], pred_quant,
                    blank_id=mcfg.blank_id, max_symbols=max_symbols,
                    max_total=max_total,
                    lookahead=self.config.greedy_lookahead,
                    lane_block=self.config.decode_lane_block)
            res = GreedyResult(tokens=tokens, counts=counts,
                               frame_idx=frames, confidence=confs,
                               state=st, pred_out=p_out, last_token=last)
            return res, feat_lens, enc_lens
        fused = None
        if self.config.use_pallas_decode_step and on_tpu:
            from ..ops.pallas.decode_step import make_fused_step_fn
            fused = make_fused_step_fn(self.model, params)
        res = greedy_decode(
            partial(self.model.predict_step, params),
            partial(self.model.joint_step_pre, params),
            enc_pre, enc_lens, state, mcfg.blank_id,
            max_symbols=max_symbols, max_total=max_total,
            lookahead=self.config.greedy_lookahead,
            fused_step_fn=fused,
            init_pred_out=pred_out.astype(dt), init_last_token=last_token,
            token_offset=token_offset)
        return res, feat_lens, enc_lens

    # ------------------------------------------------------------------
    # bucketing helpers
    # ------------------------------------------------------------------
    def _fresh_pred(self):
        """Cached prediction-net output/state for a fresh (SOS) lane."""
        if not hasattr(self, "_fresh_cache"):
            mcfg = self.model.config
            out, state = jax.jit(self.model.predict_step)(
                self.params, jnp.full((1,), mcfg.blank_id, jnp.int32),
                self.model.init_state(1, jnp.float32))
            self._fresh_cache = (np.asarray(out),
                                 (np.asarray(state[0]),
                                  np.asarray(state[1])))
        return self._fresh_cache

    def _bucket_len(self, n_samples: int) -> int:
        for sec in self._sec_buckets:
            cap = int(sec * C.SAMPLE_RATE)
            if n_samples <= cap:
                return cap
        return int(self._sec_buckets[-1] * C.SAMPLE_RATE)

    def _bucket_batch(self, b: int) -> int:
        for cap in self._batch_buckets:
            if b <= cap:
                return cap
        return self._batch_buckets[-1]

    def _bucket_batch_warm(self, b_real: int, n_bucket: int,
                           mode: str) -> int:
        """Batch bucket to dispatch ``b_real`` requests in: the natural
        bucket when that program is already compiled, otherwise the
        smallest *warm* bucket that fits (padding lanes are free compared
        to a cold XLA compile); a fully-cold fit falls back to the natural
        bucket and pays its one compile."""
        natural = self._bucket_batch(b_real)
        with self._lock:
            if (mode, natural, n_bucket) in self._compiled:
                return natural
            warm = [b for b in self._batch_buckets
                    if b >= b_real and (mode, b, n_bucket) in self._compiled]
        return min(warm) if warm else natural

    def is_warm(self, n_requests: int, max_samples: int,
                mode: Optional[str] = None) -> bool:
        """True when the bucket program for this workload is already
        compiled — callers use this to budget timeouts (XLA compiles can
        take ~1 min on a cold bucket; see cold_bucket_timeout_secs)."""
        key = (mode or self.config.decoding_mode,
               self._bucket_batch(n_requests), self._bucket_len(max_samples))
        with self._lock:
            return key in self._compiled

    def warm_batch_cap(self, max_samples: int,
                       mode: Optional[str] = None) -> int:
        """Largest batch bucket already compiled for this length bucket
        (0 = none). The continuous batcher uses this to avoid packing a
        burst into a cold bucket — requests budgeted for a warm dispatch
        must never sit behind a minutes-long XLA compile (the cold-bucket
        504 trap)."""
        mode = mode or self.config.decoding_mode
        n = self._bucket_len(max_samples)
        with self._lock:
            caps = [b for b in self._batch_buckets
                    if (mode, b, n) in self._compiled]
        return max(caps) if caps else 0

    def _mark_compiled(self, mode: str, b: int, n: int) -> None:
        with self._lock:
            new = (mode, b, n) not in self._compiled
            self._compiled.add((mode, b, n))
        if new and self.on_compile is not None:
            try:
                self.on_compile()
            except Exception:  # noqa: BLE001 — metrics must not break serving
                pass

    # ------------------------------------------------------------------
    # batched raw decode (used by the continuous batcher and bench)
    # ------------------------------------------------------------------
    def decode_samples_batch(
            self, samples: Sequence[np.ndarray],
            stream_states: Optional[Sequence[Optional[StreamState]]] = None,
    ) -> Tuple[GreedyResult, np.ndarray, np.ndarray, List[StreamState]]:
        """Decode a batch of sample arrays (padded to shape buckets).

        Returns (GreedyResult, feat_lens, enc_lens, new_stream_states);
        result rows past len(samples) are padding lanes.
        """
        cfg = self.config
        mcfg = self.model.config
        b_real = len(samples)
        if b_real == 0:
            raise InvalidAudioFormatError("empty batch")
        max_n = max(s.shape[0] for s in samples)
        n = self._bucket_len(max_n)
        b = self._bucket_batch_warm(b_real, n, "greedy")

        with self._lock:
            audio = self._staging.get((b, n))
            if audio is None:
                audio = np.zeros((b, n), np.float32)
                self._staging[(b, n)] = audio
            else:
                audio.fill(0.0)
        lens = np.zeros((b,), np.int32)
        for i, s in enumerate(samples):
            m = min(s.shape[0], n)
            audio[i, :m] = s[:m]
            lens[i] = m

        # assemble carried state — ALWAYS passed explicitly so exactly one
        # program exists per bucket (a None/array pred_out split would
        # force a second cold compile on the first carried chunk)
        if stream_states is None:
            stream_states = [None] * b_real
        fresh_out, fresh_state = self._fresh_pred()
        h0 = np.tile(fresh_state[0], (1, b, 1))
        c0 = np.tile(fresh_state[1], (1, b, 1))
        pred0 = np.tile(fresh_out, (b, 1))
        last_token = np.full((b,), mcfg.blank_id, np.int32)
        # token_offset stays 0: the max_total budget is per decode call
        # (the reference resets its counter in every greedy_decode,
        # ref: decoder_optimized.rs:78-92) — carrying the session count
        # here would silently mute any stream past ~200 tokens.
        token_offset = np.zeros((b,), np.int32)
        for i in range(b_real):
            st = stream_states[i]
            if st is not None:
                h0[:, i] = np.asarray(st.state[0])[:, 0]
                c0[:, i] = np.asarray(st.state[1])[:, 0]
                pred0[i] = np.asarray(st.pred_out)[0]
                last_token[i] = int(np.asarray(st.last_token)[0])
        pred_out = jnp.asarray(pred0)

        res, feat_lens, enc_lens = self._fwd(
            self.params, self._pred_quant, jnp.asarray(audio),
            jnp.asarray(lens),
            (jnp.asarray(h0), jnp.asarray(c0)), pred_out,
            jnp.asarray(last_token), jnp.asarray(token_offset),
            max_symbols=cfg.max_symbols_per_step,
            max_total=cfg.max_total_tokens)
        self._mark_compiled("greedy", b, n)

        new_states: List[StreamState] = []
        for i in range(b_real):
            prior = stream_states[i]
            emitted = (prior.tokens_emitted if prior else 0)
            new_states.append(StreamState(
                state=(res.state[0][:, i:i + 1], res.state[1][:, i:i + 1]),
                pred_out=res.pred_out[i:i + 1],
                last_token=res.last_token[i:i + 1],
                tokens_emitted=emitted + int(res.counts[i])))
        return res, np.asarray(feat_lens), np.asarray(enc_lens), new_states

    # ------------------------------------------------------------------
    # beam-search decode (ref capability: k2 backend, SURVEY.md §2.3 #24)
    # ------------------------------------------------------------------
    def decode_samples_beam(self, samples: np.ndarray, *,
                            bias=None, graph=None, n_best: int = 1):
        """Beam-search decode of one utterance; returns a BeamResult."""
        res, fls, els = self.decode_beam_batch([samples], bias=bias,
                                               graph=graph, n_best=n_best)
        return res, fls[0], els[0]

    # beyond this many graph states the kernel's one-hot table gathers
    # ([B*K, Np] x [Np, Vp] matmuls per micro-step) and the [Np, Vp] VMEM
    # residency outgrow the XLA gather path — route big FSAs there
    PALLAS_GRAPH_MAX_STATES = 1024

    def _beam_trace_via_kernel(self, params, enc_pre, enc_lens, bias, *,
                               beam_width, max_expansions, graph=None,
                               pred_quant=None, interpret=False):
        """Assemble a BeamTrace from the whole-scan Pallas kernel.

        Split out of _beam_forward so the wiring (arg order, bias-None
        default, trace-field assembly, graph finality) is testable on CPU
        in interpret mode (tests/test_pallas_beam_loop.py) — the backend
        gate keeps the branch itself un-exercised under pytest."""
        from ..ops.beam import BeamTrace
        from ..ops.pallas.beam_loop import beam_loop_pallas
        mcfg = self.model.config
        h, c = self.model.init_state(enc_pre.shape[0], dtype=enc_pre.dtype)
        bias_vec = (jnp.zeros((mcfg.vocab_size,), jnp.float32)
                    if bias is None else bias)
        outs = beam_loop_pallas(
            enc_pre, enc_lens, h, c, bias_vec,
            params["predictor"], params["joint"], pred_quant,
            beam_width=beam_width, max_expansions=max_expansions,
            blank_id=mcfg.blank_id, graph=graph, interpret=interpret)
        scores, lens_, expp, expt, pps, ppk = outs[:6]
        if graph is not None:
            # finality + final weights outside the kernel, identical to
            # ops.beam.beam_decode's tail (strict FSA acceptance)
            g_f = outs[6]
            pool_final = graph.is_final[g_f] | (
                (lens_ == 0) & graph.is_final[0])
            scores = scores + jnp.where(
                graph.is_final[g_f] & (lens_ > 0),
                graph.final_weight[g_f], 0.0)
        else:
            pool_final = jnp.ones(scores.shape, bool)
        return BeamTrace(
            pool_scores=scores, pool_lens=lens_, exp_parent=expp,
            exp_token=expt, pool_parent_s=pps, pool_parent_k=ppk,
            pool_final=pool_final)

    def beam_decode_path(self, graph=None) -> str:
        """Which device program a beam decode with ``graph`` (an already-
        resolved TokenTrie or None) runs: "pallas_kernel" (whole-scan
        persistent kernel) or "xla_scan". The routing is silent otherwise
        — a grammar crossing PALLAS_GRAPH_MAX_STATES triples latency with
        no visible cause, so decode_beam_batch counts the decision and
        stamps it into response metadata (round-3 verdict item)."""
        mcfg = self.model.config
        if (self.config.use_pallas_beam_loop
                and mcfg.pred_layers == 2
                and (graph is None or
                     graph.n_states <= self.PALLAS_GRAPH_MAX_STATES)
                and jax.default_backend() == "tpu"):
            return "pallas_kernel"
        return "xla_scan"

    def _beam_forward(self, params, pred_quant, audio, audio_lens, bias,
                      graph, *, beam_width, max_expansions):
        """One jitted program: mel -> encode -> beam scan (device trace).
        ``bias``/``graph`` ride as pytree args so swapping a grammar or
        bias vector reuses the compiled program (no recompile)."""
        from ..ops.beam import beam_decode
        mcfg = self.model.config
        feats, feat_lens = log_mel_features(
            audio, audio_lens, n_mels=mcfg.n_mels)
        enc, enc_lens = self.model.encode(
            params, feats.astype(self.compute_dtype), feat_lens)
        enc_pre = self.model.joint_precompute_enc(params, enc)
        if self.beam_decode_path(graph) == "pallas_kernel":
            # whole beam scan as one persistent kernel (weights — and for
            # constrained search the trie tables — VMEM-resident; see
            # ops/pallas/beam_loop.py); very large FSAs and non-2-layer
            # prediction nets keep the XLA scan below
            return (self._beam_trace_via_kernel(
                params, enc_pre, enc_lens, bias, graph=graph,
                pred_quant=pred_quant,
                beam_width=beam_width, max_expansions=max_expansions),
                feat_lens, enc_lens)
        trace = beam_decode(
            partial(self.model.predict_step, params),
            partial(self.model.joint_step_pre, params),
            enc_pre, enc_lens,
            self.model.init_state(enc.shape[0], dtype=enc.dtype),
            mcfg.blank_id, beam_width=beam_width,
            max_expansions=max_expansions, bias=bias,
            vocab_size=mcfg.vocab_size, graph=graph)
        return trace, feat_lens, enc_lens

    def decode_beam_batch(self, samples: Sequence[np.ndarray], *,
                          bias=None, graph=None, n_best: int = 1):
        """Beam-search decode a batch (padded to shape buckets).

        The beam core is fully batched over (batch x beam) lanes; this
        packs requests like decode_samples_batch. Returns
        (BeamResult over all lanes, feat_lens list, enc_lens list)."""
        from ..ops.beam import backtrace
        cfg = self.config
        g = graph if graph is not None else self.beam_graph
        path = self.beam_decode_path(g)
        self.decode_path_counts[path] += 1
        self.last_decode_path = path
        if self.on_beam_path is not None:
            self.on_beam_path(path)
        b_real = len(samples)
        n = self._bucket_len(max(s.shape[0] for s in samples))
        b = self._bucket_batch_warm(b_real, n, "beam")
        audio = np.zeros((b, n), np.float32)
        lens = np.zeros((b,), np.int32)
        for i, s in enumerate(samples):
            m = min(s.shape[0], n)
            audio[i, :m] = s[:m]
            lens[i] = m
        trace, feat_lens, enc_lens = self._beam_fwd(
            self.params, self._pred_quant, jnp.asarray(audio),
            jnp.asarray(lens),
            bias, graph if graph is not None else self.beam_graph,
            beam_width=cfg.beam_width, max_expansions=C.BEAM_MAX_EXPANSIONS)
        res = backtrace(trace, np.asarray(enc_lens),
                        max_total=cfg.max_total_tokens, n_best=n_best)
        self._mark_compiled("beam", b, n)
        return (res, [int(x) for x in np.asarray(feat_lens)[:b_real]],
                [int(x) for x in np.asarray(enc_lens)[:b_real]])

    # ------------------------------------------------------------------
    # reference-parity surface (pipeline.rs:21-67)
    # ------------------------------------------------------------------
    def process_batch_samples(self, samples: np.ndarray) -> Transcription:
        """Full decode of one utterance from f32 samples; decoding mode
        (greedy|beam) follows config (ref: decoding strategy of the k2
        backend vs the default greedy path)."""
        if self.config.decoding_mode == "beam":
            res, feat_len, enc_len = self.decode_samples_beam(
                samples, n_best=self.config.beam_n_best)
            tokens = [int(t) for t in res.tokens[0, :int(res.counts[0])]]
            tr = Transcription(
                text=self.vocab.decode_tokens(tokens), tokens=tokens,
                audio_length_samples=samples.shape[0],
                features_length=feat_len, encoded_length=enc_len,
                decode_path=self.last_decode_path)
            if res.n_best:
                tr.n_best = [
                    {"text": self.vocab.decode_tokens(seq), "score": score,
                     "tokens": seq}
                    for score, seq in res.n_best[0]]
            return tr
        res, feat_lens, enc_lens, _ = self.decode_samples_batch([samples])
        return self._to_transcription(res, 0, samples.shape[0],
                                      int(feat_lens[0]), int(enc_lens[0]))

    def process_batch(self, audio_bytes: bytes) -> Transcription:
        """Full decode of one utterance from 16-bit PCM bytes."""
        return self.process_batch_samples(self._convert(audio_bytes))

    def process_stream_samples(self, samples: np.ndarray,
                               stream_state: Optional[StreamState]
                               ) -> Tuple[Transcription, StreamState]:
        """Decode a chunk carrying device-resident decoder state."""
        res, feat_lens, enc_lens, states = self.decode_samples_batch(
            [samples], [stream_state])
        return (self._to_transcription(res, 0, samples.shape[0],
                                       int(feat_lens[0]), int(enc_lens[0])),
                states[0])

    def process_stream_chunk(self, audio_bytes: bytes,
                             stream_state: Optional[StreamState]
                             ) -> Tuple[Transcription, StreamState]:
        return self.process_stream_samples(self._convert(audio_bytes),
                                           stream_state)

    # ------------------------------------------------------------------
    def warmup(self, batch_sizes: Optional[Sequence[int]] = None,
               secs: Optional[Sequence[float]] = None) -> int:
        """Pre-compile bucket programs (startup analogue of the reference's
        connection prewarming, ref: src/main.rs:79-85). Default: batch=1
        across every length bucket in the configured decoding mode — the
        single-request serving set; the remaining batch buckets are
        compiled by :meth:`start_background_warmup` while the warm set
        serves (the batcher never packs into a cold bucket, see
        warm_batch_cap). Returns #programs."""
        n = 0
        for b in (batch_sizes or self._batch_buckets[:1]):
            for s in (secs if secs is not None else self._sec_buckets):
                self._warm_one(b, int(s * C.SAMPLE_RATE))
                n += 1
        self.warmed_up = True
        return n

    def _warm_one(self, b: int, n_samples: int) -> None:
        """Compile one (batch, length) bucket in the configured decoding
        mode using silence. Allocates its own arrays (never the shared
        staging pool) so it is safe from the background warmup thread
        while the dispatch thread serves."""
        if self.config.decoding_mode == "beam":
            # compile the NATURAL bucket directly: decode_beam_batch's
            # warm-bucket redirect would route a cold small bucket up to
            # an already-warm larger one and never compile the target,
            # leaving warmup convinced it is done while every future
            # small group pads up to the big bucket's beam lanes forever
            cfg = self.config
            bb = self._bucket_batch(b)
            nb = self._bucket_len(n_samples)
            audio = np.zeros((bb, nb), np.float32)
            lens = np.full((bb,), min(n_samples, nb), np.int32)
            self._beam_fwd(
                self.params, self._pred_quant, jnp.asarray(audio),
                jnp.asarray(lens),
                None, self.beam_graph,
                beam_width=cfg.beam_width, max_expansions=C.BEAM_MAX_EXPANSIONS)
            self._mark_compiled("beam", bb, nb)
        else:
            cfg = self.config
            mcfg = self.model.config
            bb = self._bucket_batch(b)
            nb = self._bucket_len(n_samples)
            audio = np.zeros((bb, nb), np.float32)
            lens = np.full((bb,), min(n_samples, nb), np.int32)
            fresh_out, fresh_state = self._fresh_pred()
            self._fwd(
                self.params, self._pred_quant, jnp.asarray(audio),
                jnp.asarray(lens),
                (jnp.asarray(np.tile(fresh_state[0], (1, bb, 1))),
                 jnp.asarray(np.tile(fresh_state[1], (1, bb, 1)))),
                jnp.asarray(np.tile(fresh_out, (bb, 1))),
                jnp.full((bb,), mcfg.blank_id, jnp.int32),
                jnp.zeros((bb,), jnp.int32),
                max_symbols=cfg.max_symbols_per_step,
                max_total=cfg.max_total_tokens)
            self._mark_compiled("greedy", bb, nb)

    def start_background_warmup(self) -> None:
        """Compile the not-yet-warm (batch x length) buckets on a daemon
        thread, smallest batches first, while the server is already taking
        traffic on the warm set. XLA compilation is thread-safe and runs on
        the host, so serving dispatches proceed concurrently."""
        if self._warmup_thread is not None:
            return
        self._warmup_stop.clear()

        def run():
            mode = self.config.decoding_mode
            for b in self._batch_buckets:
                for s in self._sec_buckets:
                    n = int(s * C.SAMPLE_RATE)
                    if self._warmup_stop.is_set():
                        return
                    if self.is_warm(b, n, mode):
                        continue
                    try:
                        self._warm_one(b, n)
                    except Exception:  # noqa: BLE001 — warmup must not crash
                        from ..reliability import get_logger
                        get_logger("asr.pipeline").exception(
                            "background warmup failed for bucket "
                            "(%d, %.1fs)", b, s)
                        return

        self._warmup_thread = threading.Thread(
            target=run, name="bucket-warmup", daemon=True)
        self._warmup_thread.start()

    def stop_background_warmup(self, join: bool = False) -> None:
        self._warmup_stop.set()
        if join and self._warmup_thread is not None:
            self._warmup_thread.join(timeout=30)
        self._warmup_thread = None

    # ------------------------------------------------------------------
    def _convert(self, audio_bytes: bytes) -> np.ndarray:
        if len(audio_bytes) == 0:
            raise InvalidAudioFormatError("empty audio buffer")
        if len(audio_bytes) % 2 != 0:
            raise InvalidAudioFormatError(
                "audio buffer length must be even for 16-bit PCM")
        return pcm16_bytes_to_f32(audio_bytes)

    def _to_transcription(self, res: GreedyResult, lane: int,
                          n_samples: int, feat_len: int,
                          enc_len: int) -> Transcription:
        from ..types import TokenInfo
        count = int(res.counts[lane])
        tokens = [int(t) for t in np.asarray(res.tokens[lane, :count])]
        frames = np.asarray(res.frame_idx[lane, :count])
        confs = np.asarray(res.confidence[lane, :count])
        sec_per_frame = (C.HOP_LENGTH * self.model.config.subsampling_factor
                         / C.SAMPLE_RATE)
        details = [
            TokenInfo(id=tok, time_s=round(float(f) * sec_per_frame, 3),
                      confidence=round(float(c), 4))
            for tok, f, c in zip(tokens, frames, confs)]
        return Transcription(
            text=self.vocab.decode_tokens(tokens), tokens=tokens,
            audio_length_samples=n_samples, features_length=feat_len,
            encoded_length=enc_len, token_details=details)
