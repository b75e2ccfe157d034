"""Native streaming session: stateful featurizer + cached encoder + carried
greedy decode — the TPU-native streaming mode.

Unlike the parity ("chunked") mode, nothing is re-decoded and no transcript
weaving happens: every audio sample is featurized once, every mel frame is
encoded once against the device-resident encoder cache, and every encoder
frame is consumed once by the carried greedy decode. Partial transcripts
are strictly append-only.

Featurization bookkeeping (host): the stream is conceptually
``reflect(first 256) + samples + zeros-at-flush``; frame t covers stream
samples [t*hop - 256, t*hop + 256). A frame is emitted as soon as its
window is fully available; the preemphasis filter carries one sample of
state across feeds. Per-feature normalization uses running statistics over
all frames seen so far (config ``native_norm``: "stream" | "none") — a
documented deviation from the batch path's full-utterance statistics.
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
from ..ops.greedy import GreedyResult, greedy_decode
from ..ops.mel import mel_filterbank, windowed_dft_basis
from ..ops.streaming import EncoderCache, encode_chunk, init_encoder_cache
from ..types import Transcription
from ..vocab import Vocabulary

_PAD = C.N_FFT // 2  # 256


class StreamingFeaturizer:
    """Incremental log-mel with exact frame bookkeeping."""

    def __init__(self, n_mels: int, norm: str = "stream"):
        self.n_mels = n_mels
        self.norm = norm
        self._basis = windowed_dft_basis().astype(np.float64)
        self._fb = mel_filterbank(n_mels).astype(np.float64)
        self.reset()

    def reset(self) -> None:
        self._buf = np.zeros(0, np.float32)  # preemphasized, incl. left ctx
        self._started = False
        self._prev_sample = 0.0
        self._frames_emitted = 0
        self.samples_fed = 0
        self._stat_n = 0
        self._stat_sum = np.zeros(self.n_mels)
        self._stat_sq = np.zeros(self.n_mels)

    def _preemph(self, x: np.ndarray) -> np.ndarray:
        out = x - C.PREEMPHASIS * np.concatenate(
            [[self._prev_sample], x[:-1]])
        if not self._started:
            out[0] = x[0]  # first stream sample keeps itself
        self._prev_sample = float(x[-1]) if x.size else self._prev_sample
        return out.astype(np.float32)

    def feed(self, samples: np.ndarray, final: bool = False) -> np.ndarray:
        """Returns newly available UNNORMALIZED log-mel frames [n, n_mels]
        (normalization applied separately so stats update in one place)."""
        if samples.size:
            self.samples_fed += int(samples.size)
            pre = self._preemph(samples.astype(np.float32))
            if not self._started:
                # reflect-pad the stream start like the batch path
                lead = pre[1:_PAD + 1][::-1] if pre.size > _PAD else \
                    np.concatenate([pre[1:][::-1],
                                    np.zeros(_PAD - max(pre.size - 1, 0),
                                             np.float32)])
                self._buf = np.concatenate([lead, pre])
                self._started = True
            else:
                self._buf = np.concatenate([self._buf, pre])
        if not self._started:
            return np.zeros((0, self.n_mels), np.float32)
        if final:
            self._buf = np.concatenate(
                [self._buf, np.zeros(_PAD, np.float32)])

        # buffer index of frame t window start: t*hop - 256 + 256 = t*hop
        # relative to emitted origin; buffer holds from frame
        # `_frames_emitted` onward.
        hop = C.HOP_LENGTH
        avail = self._buf.shape[0]
        n_ready = max(0, (avail - C.N_FFT) // hop + 1)
        if final:
            # batch-path total: 1 + N//hop; emit everything computable
            pass
        if n_ready == 0:
            return np.zeros((0, self.n_mels), np.float32)
        seg_len = (n_ready - 1) * hop + C.N_FFT
        seg = self._buf[:seg_len]
        idx = (np.arange(n_ready)[:, None] * hop
               + np.arange(C.N_FFT)[None, :])
        frames = seg[idx].astype(np.float64)
        spec = frames @ self._basis
        half = self._basis.shape[1] // 2
        power = spec[:, :half] ** 2 + spec[:, half:] ** 2
        logmel = np.log(power @ self._fb + C.LOG_GUARD)

        self._buf = self._buf[n_ready * hop:]
        self._frames_emitted += n_ready
        self._stat_n += n_ready
        self._stat_sum += logmel.sum(axis=0)
        self._stat_sq += (logmel ** 2).sum(axis=0)
        return logmel.astype(np.float32)

    def normalize(self, frames: np.ndarray) -> np.ndarray:
        if self.norm == "none" or self._stat_n < 2:
            return frames
        mean = self._stat_sum / self._stat_n
        var = np.maximum(
            self._stat_sq / self._stat_n - mean ** 2, 1e-10)
        std = np.sqrt(var * self._stat_n / max(self._stat_n - 1, 1)) + 1e-5
        return ((frames - mean) / std).astype(np.float32)


@dataclasses.dataclass
class NativeStreamState:
    enc_cache: EncoderCache
    decode_carry: Optional[GreedyResult]
    tokens: List[int]
    mel_backlog: np.ndarray  # frames awaiting a full encoder chunk


class NativeStreamSession:
    """One stream's native-mode pipeline; device state stays in HBM."""

    def __init__(self, model: Transducer, params, vocab: Vocabulary,
                 chunk_frames: int = 64, norm: str = "stream",
                 max_symbols: int = C.MAX_SYMBOLS_PER_STEP,
                 max_total: int = C.MAX_TOTAL_TOKENS):
        cfg = model.config
        assert cfg.causal, "native streaming requires a causal model preset"
        assert chunk_frames % cfg.subsampling_factor == 0
        self.model = model
        self.params = params
        self.vocab = vocab
        self.chunk_frames = chunk_frames
        self.max_symbols = max_symbols
        self.max_total = max_total
        self.featurizer = StreamingFeaturizer(cfg.n_mels, norm)
        # match the (possibly bf16-cast) parameter dtype throughout
        sample_leaf = jax.tree_util.tree_leaves(params["encoder"])[0]
        self._dtype = sample_leaf.dtype

        # ONE fused program per chunk: encode-with-cache + carried greedy
        # in a single dispatch (a per-chunk program switch costs a full
        # host->device round-trip on high-latency links). params are a
        # traced ARGUMENT — closing over them would bake the full model
        # into the HLO as constants.
        def chunk_step(p, feats, cache, enc_lens, state, pred_out,
                       last_token, token_offset):
            enc, cache2 = encode_chunk(p["encoder"], cfg, feats, cache)
            res = greedy_decode(
                partial(model.predict_step, p),
                partial(model.joint_step_pre, p),
                model.joint_precompute_enc(p, enc), enc_lens, state,
                cfg.blank_id, max_symbols=self.max_symbols,
                max_total=self.max_total, init_pred_out=pred_out,
                init_last_token=last_token, token_offset=token_offset)
            return cache2, res

        self._step = jax.jit(chunk_step, donate_argnums=(2,))
        self.state = NativeStreamState(
            enc_cache=init_encoder_cache(cfg, batch=1, dtype=self._dtype),
            decode_carry=None, tokens=[],
            mel_backlog=np.zeros((0, cfg.n_mels), np.float32))

    # ------------------------------------------------------------------
    def feed(self, samples: np.ndarray, final: bool = False) -> str:
        """Feed PCM samples; returns the current (append-only) transcript."""
        new = self.featurizer.feed(samples, final=final)
        if new.shape[0]:
            self.state.mel_backlog = np.concatenate(
                [self.state.mel_backlog, new], axis=0)

        while self.state.mel_backlog.shape[0] >= self.chunk_frames or (
                final and self.state.mel_backlog.shape[0] > 0):
            take = min(self.chunk_frames, self.state.mel_backlog.shape[0])
            chunk = self.state.mel_backlog[:self.chunk_frames]
            real = chunk.shape[0]
            if real < self.chunk_frames:  # final partial chunk: zero-pad
                chunk = np.concatenate(
                    [chunk, np.zeros((self.chunk_frames - real,
                                      chunk.shape[1]), np.float32)])
            self.state.mel_backlog = self.state.mel_backlog[take:]
            self._process_chunk(chunk, real)
            if final and self.state.mel_backlog.shape[0] == 0:
                break
        return self.transcript()

    def end(self) -> Transcription:
        text = self.feed(np.zeros(0, np.float32), final=True)
        return Transcription(
            text=text, tokens=list(self.state.tokens),
            audio_length_samples=self.featurizer.samples_fed,
            features_length=self.featurizer._frames_emitted,
            encoded_length=int(self.state.enc_cache.pos[0]))

    # ------------------------------------------------------------------
    def _process_chunk(self, chunk: np.ndarray, real_frames: int) -> None:
        cfg = self.model.config
        feats = self.featurizer.normalize(chunk)
        feats_dev = jnp.asarray(feats.T[None], self._dtype)  # [1, M, Tc]
        n_enc = -(-real_frames // cfg.subsampling_factor)

        carry = self.state.decode_carry
        if carry is None:
            state = self.model.init_state(1, self._dtype)
            pred_out, state = self.model.predict_step(
                self.params, jnp.full((1,), cfg.blank_id, jnp.int32),
                state)
            last = jnp.full((1,), cfg.blank_id, jnp.int32)
        else:
            state, pred_out, last = (carry.state, carry.pred_out,
                                     carry.last_token)

        # the max_total budget is per chunk-step: the reference's counter
        # is local to each greedy_decode call (decoder_optimized.rs:78-92),
        # so a long session never goes silent at 200 cumulative tokens
        offset = jnp.zeros((1,), jnp.int32)
        self.state.enc_cache, res = self._step(
            self.params, feats_dev, self.state.enc_cache,
            jnp.array([n_enc], jnp.int32), state, pred_out, last, offset)
        self.state.decode_carry = res
        n = int(res.counts[0])
        self.state.tokens.extend(
            int(t) for t in np.asarray(res.tokens)[0, :n])

    def transcript(self) -> str:
        return self.vocab.decode_tokens(self.state.tokens)
