"""Batched native streaming: a fixed pool of lanes sharing ONE fused
chunk-step program.

Single-stream native sessions dispatch one device program per stream per
chunk; at scale that wastes both dispatch overhead and MXU occupancy
(a [1, ...] chunk leaves the systolic array mostly idle). This engine is
the continuous-batching counterpart for the native streaming mode
(BASELINE config #4 applied to streams): L lanes of encoder cache +
decode carry live batched in HBM, and one jitted step advances every lane
that has a full mel chunk — lanes without work ride along masked
(their caches and decode state are select-preserved).

Capacity math (flagship, 64-frame chunks): one fused step is ~2-3 ms of
device compute for 8 lanes; a real-time stream produces a chunk every
640 ms, so a chip sustains O(100) concurrent real-time streams.

Lifecycle: ``attach() -> lane``, ``feed(lane, samples)``,
``tick() -> {lane: new tokens}``, ``finish(lane)``, ``detach(lane)``.
The server drives ``tick`` from its device-dispatch executor.
"""

from __future__ import annotations

import threading
import time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..models.transducer import Transducer
from ..ops.greedy import greedy_decode
from ..ops.streaming import encode_chunk, init_encoder_cache
from ..vocab import Vocabulary
from .native_stream import StreamingFeaturizer


class LaneEngineStats:
    """Native-mode serving observability: the lane engine is the hot path
    when streaming_mode=native, so it gets the same stats surface as the
    continuous batcher (the reference instruments its whole hot path,
    ref: src/reliability/metrics.rs:21-214; round-3 loadtests showed
    batcher zeros under 16 live native streams — this section is what
    makes native mode visible at /metrics)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.ticks = 0
        self.lanes_stepped_total = 0
        self.max_lanes_per_tick = 0
        self.attaches = 0
        self.sheds = 0              # attach() found no free lane
        self.last_tick_ms = 0.0
        self.tick_ms_ewma = 0.0

    def record_tick(self, lanes: int, dur_s: float) -> None:
        ms = dur_s * 1e3
        with self._lock:
            self.ticks += 1
            self.lanes_stepped_total += lanes
            self.max_lanes_per_tick = max(self.max_lanes_per_tick, lanes)
            self.last_tick_ms = ms
            self.tick_ms_ewma = (ms if self.ticks == 1
                                 else 0.9 * self.tick_ms_ewma + 0.1 * ms)

    def record_attach(self, ok: bool) -> None:
        with self._lock:
            if ok:
                self.attaches += 1
            else:
                self.sheds += 1

    def to_json(self, live_lanes: int, n_lanes: int,
                warmed_up: bool) -> Dict:
        with self._lock:
            ticks = self.ticks
            return {
                "ticks": ticks,
                "live_lanes": live_lanes,
                "n_lanes": n_lanes,
                "warmed_up": warmed_up,
                "lanes_stepped_total": self.lanes_stepped_total,
                "mean_lanes_per_tick": round(
                    self.lanes_stepped_total / ticks, 2) if ticks else 0.0,
                "max_lanes_per_tick": self.max_lanes_per_tick,
                "attaches": self.attaches,
                "sheds": self.sheds,
                "last_tick_ms": round(self.last_tick_ms, 2),
                "tick_ms_ewma": round(self.tick_ms_ewma, 2),
            }


class StreamingLaneEngine:
    def __init__(self, model: Transducer, params, vocab: Vocabulary,
                 n_lanes: int = 8, chunk_frames: int = 64,
                 norm: str = "stream",
                 max_symbols: int = C.MAX_SYMBOLS_PER_STEP,
                 max_total: int = C.MAX_TOTAL_TOKENS, mesh=None):
        cfg = model.config
        assert cfg.causal, "lane engine requires a causal model preset"
        assert chunk_frames % cfg.subsampling_factor == 0
        self.model = model
        if mesh is not None:
            # tensor-parallel serving for the native streaming path: the
            # same declarative TP shardings as AsrPipeline (parallel.mesh
            # megatron-style rules); GSPMD inserts the ICI collectives
            # inside the fused chunk step. Lane state stays replicated —
            # the chunk step is latency-bound, so TP splits the matmuls.
            from ..parallel.mesh import shard_params
            params = shard_params(mesh, params)
        self.mesh = mesh
        self.params = params
        self.vocab = vocab
        self.cfg = cfg
        self.n_lanes = n_lanes
        self.chunk_frames = chunk_frames
        self.norm = norm
        leaf = jax.tree_util.tree_leaves(params["encoder"])[0]
        self._dtype = leaf.dtype

        # batched device state
        self.enc_cache = init_encoder_cache(cfg, n_lanes, self._dtype)
        state = model.init_state(n_lanes, self._dtype)
        pred0, state = model.predict_step(
            params, jnp.full((n_lanes,), cfg.blank_id, jnp.int32), state)
        self.dec_state = state
        self.pred_out = pred0
        self.last_token = jnp.full((n_lanes,), cfg.blank_id, jnp.int32)
        self._fresh = (jax.tree_util.tree_map(jnp.copy, state),
                       jnp.copy(pred0))

        # host-side per-lane session state
        self.featurizers: List[Optional[StreamingFeaturizer]] = \
            [None] * n_lanes
        self.backlogs: List[np.ndarray] = [
            np.zeros((0, cfg.n_mels), np.float32) for _ in range(n_lanes)]
        self.tokens: List[List[int]] = [[] for _ in range(n_lanes)]
        self.finishing: List[bool] = [False] * n_lanes

        def step(p, feats, active, enc_lens, cache, state, pred_out,
                 last_token, token_offset):
            """feats [L, M, Tc]; active [L] bool; enc_lens [L] = real
            encoder frames to decode this chunk (0 for inactive, partial
            for a final chunk). Inactive lanes keep all state
            bit-identical (masked select)."""
            enc, cache2 = encode_chunk(p["encoder"], cfg, feats, cache)

            def keep(new, old):
                shape = [1] * new.ndim
                # cache leaves are [L, ...]; pos is [L]
                shape[0] = active.shape[0]
                return jnp.where(active.reshape(shape), new, old)

            cache2 = jax.tree_util.tree_map(keep, cache2, cache)
            res = greedy_decode(
                partial(model.predict_step, p),
                partial(model.joint_step_pre, p),
                model.joint_precompute_enc(p, enc), enc_lens, state,
                cfg.blank_id, max_symbols=max_symbols,
                max_total=max_total, init_pred_out=pred_out,
                init_last_token=last_token, token_offset=token_offset)
            return cache2, res

        self._step = jax.jit(step, donate_argnums=(4,))
        self._max_total = max_total
        self._max_symbols = max_symbols

        # one-lane fresh values for the jitted masked reset (closure
        # constants: all tiny — zeros cache slices + one LSTM step output)
        fresh_cache1 = init_encoder_cache(cfg, 1, self._dtype)
        fresh_h1 = self._fresh[0][0][:, :1]
        fresh_c1 = self._fresh[0][1][:, :1]
        fresh_pred1 = self._fresh[1][:1]

        def reset_lane(cache, state, pred_out, last_token, lane):
            """Reset ONE lane's device state in place (masked select on
            device). Replaces the old full-engine host round-trip: on a
            100-200 ms/dispatch link the D2H+H2D of every lane's cache per
            stream connect was a multi-transfer stall that grew with
            n_lanes x cache size."""
            hit = jnp.arange(n_lanes) == lane  # [L]

            def mask(axis, new1, old):
                # new1 has size 1 on the lane axis; where() broadcasts it
                shape = [1] * old.ndim
                shape[axis] = n_lanes
                return jnp.where(hit.reshape(shape), new1.astype(old.dtype),
                                 old)

            cache = jax.tree_util.tree_map(
                lambda f, o: mask(0, f, o), fresh_cache1, cache)
            state = (mask(1, fresh_h1, state[0]),
                     mask(1, fresh_c1, state[1]))
            pred_out = mask(0, fresh_pred1, pred_out)
            last_token = mask(0, jnp.full((1,), cfg.blank_id, jnp.int32),
                              last_token)
            return cache, state, pred_out, last_token

        self._reset = jax.jit(reset_lane, donate_argnums=(0, 1, 2, 3))

        self.warmed_up = False
        self.stats = LaneEngineStats()
        # optional PrometheusMetrics; AppState wires it (like the batcher)
        self.prometheus = None

    # ------------------------------------------------------------------
    def warm(self) -> float:
        """Compile + first-dispatch the fused chunk-step and lane-reset
        programs BEFORE any stream is admitted; returns seconds taken.

        Warm-before-accept: the first dispatch of a fresh program on the
        axon platform can take 2-85 s (compile aside), which blows the
        per-decode budget of whichever unlucky stream triggers it — the
        round-3 native loadtest's reconnect storm (661 sessions for 16
        streams) was exactly this. An all-inactive step is state-preserving
        (masked select), so warming is invisible to lanes."""
        t0 = time.perf_counter()
        feats = jnp.zeros((self.n_lanes, self.cfg.n_mels, self.chunk_frames),
                          self._dtype)
        active = jnp.zeros((self.n_lanes,), bool)
        zeros = jnp.zeros((self.n_lanes,), jnp.int32)
        cache2, res = self._step(
            self.params, feats, active, zeros, self.enc_cache,
            self.dec_state, self.pred_out, self.last_token, zeros)
        self.enc_cache = cache2
        self.dec_state = res.state
        self.pred_out = res.pred_out
        self.last_token = res.last_token
        self._reset_lane_device_state(0)
        # host readback, not block_until_ready: on axon the latter can
        # return before execution finishes (CLAUDE.md timing gotcha)
        np.asarray(self.last_token)
        self.warmed_up = True
        return time.perf_counter() - t0

    # ------------------------------------------------------------------
    # lane lifecycle
    # ------------------------------------------------------------------
    def attach(self) -> Optional[int]:
        """Claim a free lane; None when all lanes are busy."""
        for lane in range(self.n_lanes):
            if self.featurizers[lane] is None:
                self.featurizers[lane] = StreamingFeaturizer(
                    self.cfg.n_mels, self.norm)
                self.backlogs[lane] = np.zeros((0, self.cfg.n_mels),
                                               np.float32)
                self.tokens[lane] = []
                self.finishing[lane] = False
                self._reset_lane_device_state(lane)
                self.stats.record_attach(True)
                return lane
        self.stats.record_attach(False)
        if self.prometheus is not None:
            self.prometheus.lane_sheds.inc()
        return None

    @property
    def live_lanes(self) -> int:
        return sum(1 for f in self.featurizers if f is not None)

    def detach(self, lane: int) -> None:
        self.featurizers[lane] = None
        self.finishing[lane] = False

    def _reset_lane_device_state(self, lane: int) -> None:
        """Reset one lane's device state: a single jitted masked-select
        dispatch with donated carries (no host round-trips)."""
        (self.enc_cache, self.dec_state, self.pred_out,
         self.last_token) = self._reset(
            self.enc_cache, self.dec_state, self.pred_out,
            self.last_token, jnp.int32(lane))

    # ------------------------------------------------------------------
    def feed(self, lane: int, samples: np.ndarray,
             final: bool = False) -> None:
        feat = self.featurizers[lane]
        assert feat is not None, f"lane {lane} not attached"
        new = feat.feed(samples, final=final)
        if new.shape[0]:
            self.backlogs[lane] = np.concatenate(
                [self.backlogs[lane], new], axis=0)
        if final:
            self.finishing[lane] = True

    def lane_ready(self, lane: int) -> bool:
        if self.featurizers[lane] is None:
            return False
        n = self.backlogs[lane].shape[0]
        return n >= self.chunk_frames or (self.finishing[lane] and n > 0)

    def pending(self) -> List[int]:
        return [i for i in range(self.n_lanes) if self.lane_ready(i)]

    # ------------------------------------------------------------------
    def tick(self) -> Dict[int, List[int]]:
        """Advance every ready lane one chunk; returns new tokens per lane.
        No-op (empty dict) when nothing is ready."""
        ready = self.pending()
        if not ready:
            return {}
        t0 = time.perf_counter()
        m = self.cfg.n_mels
        tc = self.chunk_frames
        feats = np.zeros((self.n_lanes, m, tc), np.float32)
        active = np.zeros((self.n_lanes,), bool)
        enc_lens = np.zeros((self.n_lanes,), np.int32)
        sub = self.cfg.subsampling_factor
        for lane in ready:
            chunk = self.backlogs[lane][:tc]
            real = chunk.shape[0]
            self.backlogs[lane] = self.backlogs[lane][real:]
            chunk = self.featurizers[lane].normalize(chunk)
            if real < tc:
                chunk = np.concatenate(
                    [chunk, np.zeros((tc - real, m), np.float32)])
            feats[lane] = chunk.T
            active[lane] = True
            enc_lens[lane] = -(-real // sub)  # only real frames decode

        # max_total budget is per chunk-step (reference parity: the
        # counter is local to each greedy_decode call,
        # ref: decoder_optimized.rs:78-92) — long sessions keep emitting.
        offsets = np.zeros((self.n_lanes,), np.int32)
        cache2, res = self._step(
            self.params, jnp.asarray(feats, self._dtype),
            jnp.asarray(active), jnp.asarray(enc_lens), self.enc_cache,
            self.dec_state, self.pred_out, self.last_token,
            jnp.asarray(offsets))
        self.enc_cache = cache2
        self.dec_state = res.state
        self.pred_out = res.pred_out
        self.last_token = res.last_token

        out: Dict[int, List[int]] = {}
        counts = np.asarray(res.counts)
        toks = np.asarray(res.tokens)
        for lane in ready:
            n = int(counts[lane])
            new = [int(t) for t in toks[lane, :n]]
            self.tokens[lane].extend(new)
            out[lane] = new
        # np.asarray above is a host readback, so the timing is honest
        dur = time.perf_counter() - t0
        self.stats.record_tick(len(ready), dur)
        if self.prometheus is not None:
            self.prometheus.observe_lane_tick(len(ready), dur)
        return out

    # ------------------------------------------------------------------
    def transcript(self, lane: int) -> str:
        return self.vocab.decode_tokens(self.tokens[lane])

    def drain(self, lane: int) -> str:
        """Run ticks until the lane's backlog empties (after a final feed)."""
        while self.lane_ready(lane):
            self.tick()
        return self.transcript(lane)
