"""Benchmark: batch transcription real-time factor per chip + segment
breakdown + MFU + native-streaming lane metrics.

Runs the flagship end-to-end pipeline (log-mel -> conformer encoder ->
on-device greedy RNN-T decode) on the real TPU chip and reports RTFx =
seconds of audio transcribed per wall-clock second, plus per-segment
device time (mel / encode / decode) and model FLOP utilization so decode-
tail regressions are visible, not estimated.

Baseline: the reference's production throughput target is 10x real-time on
multi-core x86 + Triton GPU (ref: README.md:400, BASELINE.md), so
vs_baseline = our_RTFx / 10.

Prints ONE JSON line on stdout; diagnostics go to stderr.
Env knobs: ASR_BENCH_BATCH (default 16), ASR_BENCH_NO_PALLAS=1,
ASR_BENCH_NO_STREAM=1 (skip the streaming-lane section).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import signal
import sys
import time

import jax

# persistent compilation cache: the flagship program takes minutes to
# compile via the remote compile service; cache hits make reruns instant
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# TPU v5e (v5 lite) peak: 197 bf16 TFLOP/s per chip (394 int8 TOPS)
PEAK_TFLOPS = float(os.environ.get("ASR_BENCH_PEAK_TFLOPS", "197"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class _SectionTimeout(Exception):
    pass


@contextlib.contextmanager
def deadline(seconds: int, what: str):
    """Hard wall-clock cap on an optional bench section. The remote compile
    service occasionally wedges mid-compile for tens of minutes; optional
    sections (segments, streaming) must never hang the headline artifact.
    SIGALRM interrupts the blocked compile wait in the main thread."""
    def on_alarm(signum, frame):
        raise _SectionTimeout(f"{what} exceeded {seconds}s")

    prev = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, prev)


def timeit(fn, iters=20):
    """Steady-state seconds/call: fn returns a device array; sync once at
    the end so per-call tunnel RTT doesn't pollute device timing. The
    final flush/sync costs ~30 ms through the dev tunnel regardless of the
    work queued, so enough iterations must amortize it (measured: 5 iters
    overstates a 33 ms program by ~6 ms/call, 20 iters by ~1.5 ms).
    The end-of-loop sync is a HOST READBACK, not block_until_ready: on the
    axon platform block_until_ready can return before execution finishes
    (observed: "0.4 ms" for a 120 ms program), while a device-to-host copy
    of the output cannot complete early.
    The warm/compile call retries: the remote compile service occasionally
    drops a connection mid-compile (transient; the persistent cache makes
    the retry cheap)."""
    for attempt in range(3):
        try:
            np.asarray(jax.tree_util.tree_leaves(fn())[0])  # compile + warm
            break
        except Exception as e:  # noqa: BLE001 — transient compile transport
            if attempt == 2:
                raise
            log(f"compile attempt {attempt + 1} failed ({e!r}); retrying")
            time.sleep(10)
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / iters


# ---------------------------------------------------------------------------
# analytic FLOP model (matmul MACs x2; elementwise ignored)
# ---------------------------------------------------------------------------
def flops_mel(b: int, n_samples: int, n_mels: int = 128) -> float:
    t = 1 + n_samples // 160
    dft = 2 * t * 512 * 514          # windowed DFT as 4 hop matmuls
    mel = 2 * t * 257 * n_mels
    return b * (dft + mel)


def flops_encoder(cfg, b: int, n_samples: int) -> float:
    t = 1 + n_samples // 160
    # subsampling convs (stride 2, kernel 5)
    ch = cfg.subsampling_dim
    total, t_i, in_ch = 0.0, t, cfg.n_mels
    for _ in range(int(np.log2(cfg.subsampling_factor))):
        t_i = (t_i + 1) // 2
        total += 2 * t_i * 5 * in_ch * ch
        in_ch = ch
    tp = t_i
    total += 2 * tp * ch * cfg.d_model  # proj
    d, ffd = cfg.d_model, cfg.ff_expansion * cfg.d_model
    per_tok = (2 * (2 * d * ffd + 2 * ffd * d)   # two macaron FFs
               + 2 * d * 3 * d + 2 * d * d      # qkv + out proj
               + 4 * tp * d                      # scores + attn@v
               + 2 * d * 2 * d + 2 * cfg.conv_kernel * d + 2 * d * d)  # conv
    total += cfg.n_layers * tp * per_tok
    total += 2 * tp * d * cfg.d_enc  # out_proj
    total += 2 * tp * cfg.d_enc * cfg.d_joint  # joint enc precompute (hoist)
    return b * total


def flops_decode(cfg, b: int, tp: int, counts, lookahead: int) -> float:
    """Modeled decode-loop work: iterations ~= blank-run skips + emissions
    (upper bound per lane; all lanes do batched work every iteration)."""
    iters = int(np.ceil(tp / lookahead) + np.max(counts))
    d_p, d_e, d_j, v = (cfg.d_pred, cfg.d_embed, cfg.d_joint,
                        cfg.vocab_size)
    # 2-layer LSTM step + joint pred-proj + fused joint over the lookahead
    lstm = 2 * (d_e + d_p) * 4 * d_p + 2 * (d_p + d_p) * 4 * d_p
    joint = 2 * d_p * d_j + lookahead * 2 * d_j * v
    return iters * b * (lstm + joint)


# ---------------------------------------------------------------------------
def bench_batch(results: dict) -> None:
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    from amira_rust_asr_server_tpu.vocab import Vocabulary

    model = Transducer.from_preset("large")
    cfg = model.config
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log(f"init large model: {model.param_count(params)/1e6:.1f}M params "
        f"in {time.time()-t0:.1f}s")

    b = int(os.environ.get("ASR_BENCH_BATCH", "16"))
    secs = 30.0
    n = int(secs * 16000)
    rng = np.random.default_rng(0)

    # TRAINED weights when available (tools/train_synth.py): the headline
    # then measures realistic emission rates on real synthetic speech.
    # Fallback (fresh clone without the gitignored checkpoint tree):
    # random weights + a calibrated blank bias so decode still mirrors
    # speech-like emission (~1-7 tokens/s at this seed).
    repo = os.path.dirname(os.path.abspath(__file__))
    ckpt = os.environ.get("ASR_BENCH_CKPT",
                          os.path.join(repo, "model-repo", "large-synth-v2"))
    if not os.path.isdir(ckpt) and "ASR_BENCH_CKPT" not in os.environ:
        # older mixed-training tree (round-3 recipe) as fallback
        ckpt = os.path.join(repo, "model-repo", "large-synth")
    if os.path.isdir(ckpt):
        params = model.load_checkpoint(os.path.abspath(ckpt), like=params)
        results["weights"] = "trained-synthspeech"
        from amira_rust_asr_server_tpu.testing.synthspeech import (
            random_token_ids, synth_token_ids)

        def make_wave():
            parts = []
            total = 0
            while total < n:
                w = synth_token_ids(
                    random_token_ids(rng, 4, 18), noise=0.01,
                    rate=float(rng.uniform(0.85, 1.25)), rng=rng)
                parts.append(w)
                total += len(w)
            return np.concatenate(parts)[:n].astype(np.float32)

        waves = [make_wave() for _ in range(b)]
        log(f"loaded trained checkpoint {ckpt}; synthspeech audio")
    else:
        # +6.0 suppresses runaway emission so the fallback measures the
        # blank-skip fast path instead of the max_total worst case.
        # (round-4 postmortem: +3.0 sat inside the random-logit noise
        # margin — max of 1030 ~unit-scale logits beats it most steps —
        # so every lane emitted the full 200-token budget.) Emission on
        # random weights is noise-driven, NOT calibrated to speech; the
        # "weights" stamp marks this capture as non-headline-grade.
        params["joint"]["out"]["b"] = (
            params["joint"]["out"]["b"].at[cfg.blank_id].add(6.0))
        results["weights"] = "random+blank-bias"
        waves = [(rng.standard_normal(n) * 0.1).astype(np.float32)
                 for _ in range(b)]
        log("no trained checkpoint; random weights + blank bias")

    use_pallas = os.environ.get("ASR_BENCH_NO_PALLAS") != "1"
    pcfg = Config(audio_sec_buckets=[secs], batch_buckets=[b],
                  compute_dtype="bfloat16", use_pallas_mel=use_pallas)
    vocab = Vocabulary.load(
        os.path.join(repo, "model-repo", "vocab.txt"))
    pipe = AsrPipeline(model, params, vocab, pcfg)

    t0 = time.time()
    res, *_ = pipe.decode_samples_batch(waves)
    jax.block_until_ready(res.counts)
    counts = np.asarray(res.counts)
    log(f"compile+first run: {time.time()-t0:.1f}s; "
        f"counts={counts.tolist()}")

    # steady-state: time the compiled program with device-resident inputs.
    # (This dev box reaches the chip through a network tunnel, so the 15MB
    # per-call H2D would measure tunnel bandwidth, not the serving path —
    # on a co-located TPU VM that transfer is PCIe-speed and negligible.)
    audio_dev = jax.device_put(jnp.asarray(np.stack(waves)))
    lens_dev = jax.device_put(jnp.full((b,), n, jnp.int32))
    fresh_out, fresh_state = pipe._fresh_pred()
    h0 = jax.device_put(jnp.asarray(np.tile(fresh_state[0], (1, b, 1))))
    c0 = jax.device_put(jnp.asarray(np.tile(fresh_state[1], (1, b, 1))))
    pred0 = jax.device_put(jnp.asarray(np.tile(fresh_out, (b, 1))))
    last = jax.device_put(jnp.full((b,), cfg.blank_id, jnp.int32))
    off = jax.device_put(jnp.zeros((b,), jnp.int32))

    def run_full():
        r, fl, el = pipe._fwd(
            pipe.params, pipe._pred_quant, audio_dev, lens_dev, (h0, c0),
            pred0, last, off,
            max_symbols=pcfg.max_symbols_per_step,
            max_total=pcfg.max_total_tokens)
        return r.counts

    full_s = timeit(run_full)
    audio_seconds = b * secs
    rtfx = audio_seconds / full_s
    log(f"steady-state: {full_s*1000:.1f} ms per batch of "
        f"{audio_seconds:.0f}s audio -> RTFx {rtfx:.0f}")

    # -- segment programs: mel-only, then mel+encode(+joint hoist) ---------
    if use_pallas and jax.default_backend() == "tpu":
        from amira_rust_asr_server_tpu.ops.pallas.mel_kernel import \
            log_mel_features_pallas as mel_fn
    else:
        from amira_rust_asr_server_tpu.ops import log_mel_features as mel_fn

    @jax.jit
    def run_mel(audio, lens):
        feats, fl = mel_fn(audio, lens, n_mels=cfg.n_mels)
        # scalar output: keeps the end-of-loop host readback tiny (the
        # f32 reduce adds ~0.03 ms, the 24 MB readback it avoids is huge)
        return feats.astype(jnp.float32).mean()

    # params MUST be a traced argument: closing over them bakes ~840MB of
    # constants into the HLO, which the remote compile service rejects
    # (HTTP 413 "length limit exceeded")
    @jax.jit
    def run_encode(p, audio, lens):
        feats, fl = mel_fn(audio, lens, n_mels=cfg.n_mels)
        enc, el = pipe.model.encode(p, feats.astype(jnp.bfloat16), fl)
        return pipe.model.joint_precompute_enc(p, enc).astype(
            jnp.float32).mean()

    results.update({
        "metric": "batch_rtfx_per_chip",
        "value": round(rtfx, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / 10.0, 2),
        "batch": b,
    })

    # -- dispatch-overhead calibration ---------------------------------------
    # On this dev setup every dispatch from a loaded serving process carries
    # a measurable fixed cost (tunnel RPC + runtime bookkeeping) that a
    # co-located TPU VM does not pay. Measure it with a trivial program in
    # the same process and report the device-only RTFx alongside the raw
    # wall-clock headline (which stays the conservative headline value).
    try:
        # tiny output: timeit ends in a host readback, so the probe must
        # not return a big array (30 MB through the tunnel would measure
        # tunnel bandwidth, not dispatch overhead)
        trivial = jax.jit(lambda x: x[0, :8] * 2.0)
        overhead_s = timeit(lambda: trivial(audio_dev))
        results["dispatch_overhead_ms_est"] = round(overhead_s * 1e3, 2)
        # Sanity gate (round-4 postmortem): a degraded tunnel measured
        # ~70 ms/dispatch and silently produced what read as a real perf
        # collapse (int8 < bf16, decode 0.0 ms). Healthy captures sit
        # ~1.5 ms; stamp the artifact so a degraded capture can never be
        # mistaken for a regression.
        if overhead_s * 1e3 > 10.0:
            results["tunnel_degraded"] = True
            log(f"WARNING: dispatch overhead {overhead_s*1e3:.1f} ms > "
                f"10 ms sanity bound — tunnel degraded; timing-derived "
                f"fields in this capture are not regression-grade")
        if overhead_s < full_s * 0.5:
            results["rtfx_device_est"] = round(
                audio_seconds / (full_s - overhead_s), 1)
            log(f"dispatch overhead ~{overhead_s*1e3:.2f} ms -> "
                f"device-only RTFx ~{results['rtfx_device_est']}")
        else:
            # overhead >= half the steady-state: subtracting it would
            # produce a negative/absurd device time, so don't estimate
            log(f"dispatch overhead ~{overhead_s*1e3:.2f} ms >= 50% of "
                f"steady-state ({full_s*1e3:.1f} ms); device-only RTFx "
                f"not estimable")
    except Exception as e:  # noqa: BLE001
        log(f"overhead calibration failed: {e!r}")

    # -- MFU (model FLOPs over the measured e2e wall) ------------------------
    f_mel = flops_mel(b, n, cfg.n_mels)
    f_enc = flops_encoder(cfg, b, n)
    tp = int(np.ceil((1 + n // 160) / cfg.subsampling_factor))
    f_dec = flops_decode(cfg, b, tp, counts, pcfg.greedy_lookahead)
    mfu_e2e = (f_mel + f_enc + f_dec) / full_s / (PEAK_TFLOPS * 1e12)
    log(f"model TFLOP: mel {f_mel/1e12:.2f} enc {f_enc/1e12:.2f} "
        f"dec {f_dec/1e12:.2f} | MFU e2e {mfu_e2e:.1%}")
    results.update({"mfu_e2e": round(mfu_e2e, 3),
                    "peak_tflops": PEAK_TFLOPS})

    # -- segment breakdown (separate compiles; never blocks the headline) ----
    try:
        with deadline(int(os.environ.get("ASR_BENCH_SEG_TIMEOUT", "1200")),
                      "segment bench"):
            mel_s = timeit(lambda: run_mel(audio_dev, lens_dev))
            enc_s = timeit(lambda: run_encode(pipe.params, audio_dev,
                                              lens_dev))
        # mel_s alone carries the per-dispatch overhead; the encode/decode
        # figures are differences of equally-burdened measurements, so the
        # overhead cancels there. Subtract the calibrated overhead from the
        # mel segment only.
        ov_s = results.get("dispatch_overhead_ms_est", 0.0) / 1e3
        mel_dev = max(mel_s - ov_s, 0.0)
        encode_s = max(enc_s - mel_s, 0.0)
        decode_s = max(full_s - enc_s, 0.0)
        mfu_enc = f_enc / max(enc_s - mel_s, 1e-9) / (PEAK_TFLOPS * 1e12)
        log(f"segments: mel {mel_dev*1e3:.1f} ms | encode "
            f"{encode_s*1e3:.1f} ms | decode {decode_s*1e3:.1f} ms | "
            f"MFU enc {mfu_enc:.1%}")
        results.update({
            "segments_ms": {"mel": round(mel_dev * 1e3, 2),
                            "encode": round(encode_s * 1e3, 2),
                            "decode": round(decode_s * 1e3, 2)},
            "mfu_encode": round(mfu_enc, 3),
        })
        # Attribution sanity (round-4 postmortem: decode "0.0 ms" while
        # all 16 lanes emitted the full 200-token budget): the decode
        # segment is a difference of two separately-timed programs, and
        # under tunnel degradation the subtraction goes negative and
        # clamps. Flag it rather than letting 0.0 read as "decode is
        # free".
        if full_s <= enc_s and int(np.max(counts)) > 0:
            results["segments_suspect"] = True
            log("WARNING: encode-segment time >= full-pipeline time with "
                "nonzero emissions — segment attribution is noise, not "
                "a real 0-cost decode")
    except (Exception, _SectionTimeout) as e:  # noqa: BLE001
        log(f"segment bench failed: {e!r}")

    # context for the optional beam section (same model/weights/audio)
    ctx = {"model": model, "params": params, "vocab": vocab,
           "waves": waves, "secs": secs, "b": b}

    # -- int8 (W8A8 dynamic) serving config ----------------------------------
    # Encoder dense matmuls ride the W8A8 path (bandwidth win — int8 lowers
    # at the same MXU rate as bf16 here; ops/quant.py). Golden-transcript
    # tests (tests/test_quant.py) lock that served text survives
    # quantization. Headline takes the faster of the two configs.
    if os.environ.get("ASR_BENCH_NO_INT8") == "1":
        return ctx
    try:
        with deadline(int(os.environ.get("ASR_BENCH_INT8_TIMEOUT", "1200")),
                      "int8 bench"):
            qcfg = dataclasses.replace(pcfg, quantization="int8")
            pipe_q = AsrPipeline(model, params, vocab, qcfg)

            def run_q():
                r, fl, el = pipe_q._fwd(
                    pipe_q.params, pipe_q._pred_quant, audio_dev, lens_dev,
                    (h0, c0), pred0,
                    last, off, max_symbols=qcfg.max_symbols_per_step,
                    max_total=qcfg.max_total_tokens)
                return r.counts

            t0 = time.time()
            jax.block_until_ready(run_q())
            log(f"int8 compile+first: {time.time()-t0:.1f}s")
            q_s = timeit(run_q)
            rtfx_q = audio_seconds / q_s
            log(f"int8 steady-state: {q_s*1000:.1f} ms -> RTFx {rtfx_q:.0f}"
                f" (bf16: {rtfx:.0f})")
            results["rtfx_int8"] = round(rtfx_q, 1)
            if rtfx_q > rtfx:
                results.update({
                    "value": round(rtfx_q, 1),
                    "vs_baseline": round(rtfx_q / 10.0, 2),
                    "quantization": "int8",
                    "rtfx_bf16": round(rtfx, 1),
                    "mfu_e2e": round((f_mel + f_enc + f_dec) / q_s
                                     / (PEAK_TFLOPS * 1e12), 3),
                })
                ov = results.get("dispatch_overhead_ms_est")
                if ov is not None and ov / 1e3 < q_s * 0.5:
                    results["rtfx_device_est"] = round(
                        audio_seconds / (q_s - ov / 1e3), 1)
            else:
                results["quantization"] = "none"
                if rtfx_q < rtfx * 0.9 and not results.get(
                        "tunnel_degraded"):
                    # int8 has beaten bf16 on every healthy capture
                    # (BENCH_r02, PARITY round-3); a >10% inversion on a
                    # healthy tunnel is a quant-path regression — flag it
                    results["int8_inversion_suspect"] = True
                    log("WARNING: int8 slower than bf16 by >10% on a "
                        "healthy tunnel — investigate the quant path")
    except (Exception, _SectionTimeout) as e:  # noqa: BLE001
        log(f"int8 bench failed: {e!r}")
    return ctx


# ---------------------------------------------------------------------------
def bench_beam(results: dict, ctx: dict) -> None:
    """Beam search (width 10) on the flagship: the driver-captured beam
    number (previously prose-only in PARITY.md). Same weights/audio as the
    headline; unconstrained search rides the whole-scan Pallas kernel
    (ops/pallas/beam_loop.py)."""
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.runtime import AsrPipeline

    model, params, vocab = ctx["model"], ctx["params"], ctx["vocab"]
    b, secs, waves = ctx["b"], ctx["secs"], ctx["waves"]
    width = int(os.environ.get("ASR_BENCH_BEAM_WIDTH", "10"))
    bcfg = Config(audio_sec_buckets=[secs], batch_buckets=[b],
                  compute_dtype="bfloat16", decoding_mode="beam",
                  beam_width=width)
    pipe_b = AsrPipeline(model, params, vocab, bcfg)

    n = int(secs * 16000)
    audio_dev = jax.device_put(jnp.asarray(np.stack(waves)))
    lens_dev = jax.device_put(jnp.full((b,), n, jnp.int32))

    from amira_rust_asr_server_tpu import constants as C

    def run_beam():
        trace, fl, el = pipe_b._beam_fwd(
            pipe_b.params, pipe_b._pred_quant, audio_dev, lens_dev,
            None, None,
            beam_width=width, max_expansions=C.BEAM_MAX_EXPANSIONS)
        return trace.pool_scores

    t0 = time.time()
    jax.block_until_ready(run_beam())
    log(f"beam compile+first: {time.time()-t0:.1f}s")
    beam_s = timeit(run_beam)
    audio_seconds = b * secs
    rtfx_b = audio_seconds / beam_s
    log(f"beam w={width}: {beam_s*1e3:.1f} ms per batch -> RTFx {rtfx_b:.0f}")
    results.update({
        "beam_ms": round(beam_s * 1e3, 2),
        "beam_rtfx": round(rtfx_b, 1),
        "beam_width": width,
    })


# ---------------------------------------------------------------------------
def bench_streaming(results: dict) -> None:
    """Native streaming lanes: steady-state fused chunk-step latency and
    the implied real-time stream capacity per chip."""
    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.runtime.lane_engine import \
        StreamingLaneEngine
    from amira_rust_asr_server_tpu.vocab import Vocabulary

    model = Transducer.from_preset("large-streaming")
    cfg = model.config
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    repo = os.path.dirname(os.path.abspath(__file__))
    stream_ckpt = os.path.join(repo, "model-repo", "large-synth-stream")
    if os.path.isdir(stream_ckpt):
        # trained causal checkpoint: realistic emission rates in the
        # chunk step (tools/train_synth.py --preset large-streaming)
        params = model.load_checkpoint(stream_ckpt, like=params)
        results["stream_weights"] = "trained-synthspeech"
        log(f"streaming: loaded trained causal checkpoint {stream_ckpt}")
    else:
        params["joint"]["out"]["b"] = (
            params["joint"]["out"]["b"].at[cfg.blank_id].add(3.0))
        results["stream_weights"] = "random+blank-bias"
    cast = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, p))
    params = cast(params)

    lanes = int(os.environ.get("ASR_BENCH_LANES", "64"))
    chunk_frames = 64  # 64 mel frames = 0.64 s of audio per chunk
    engine = StreamingLaneEngine(model, params, Vocabulary.from_map({}),
                                 n_lanes=lanes, chunk_frames=chunk_frames)

    rng = np.random.default_rng(1)
    if os.path.isdir(stream_ckpt):
        # real synthspeech mel chunks: the carried decode state sees
        # speech-like emission rates instead of noise->blank
        from amira_rust_asr_server_tpu.ops import log_mel_features
        from amira_rust_asr_server_tpu.testing.synthspeech import (
            random_token_ids, synth_token_ids)
        n_chunk = chunk_frames * 160
        audio = np.zeros((lanes, n_chunk), np.float32)
        for i in range(lanes):
            parts, total = [], 0
            while total < n_chunk:
                w = synth_token_ids(random_token_ids(rng, 4, 18),
                                    noise=0.01, rng=rng)
                parts.append(w)
                total += len(w)
            audio[i] = np.concatenate(parts)[:n_chunk]
        f, _ = log_mel_features(jnp.asarray(audio),
                                jnp.full((lanes,), n_chunk, jnp.int32),
                                n_mels=cfg.n_mels)
        feats = f[:, :, :chunk_frames].astype(jnp.bfloat16)
    else:
        feats = jnp.asarray(
            rng.standard_normal((lanes, cfg.n_mels, chunk_frames)) * 0.3,
            jnp.bfloat16)
    active = jnp.ones((lanes,), bool)
    enc_lens = jnp.full((lanes,), chunk_frames // cfg.subsampling_factor,
                        jnp.int32)
    off = jnp.zeros((lanes,), jnp.int32)

    state = {"cache": engine.enc_cache, "dec": engine.dec_state,
             "pred": engine.pred_out, "last": engine.last_token}

    def run_step():
        cache2, res = engine._step(
            engine.params, feats, active, enc_lens, state["cache"],
            state["dec"], state["pred"], state["last"], off)
        # chain the FULL carried state so successive dispatches are truly
        # data-dependent (axon can report bogus sub-roofline times for
        # loops of independent identical dispatches)
        state["cache"] = cache2
        state["dec"] = res.state
        state["pred"] = res.pred_out
        state["last"] = res.last_token
        return res.counts

    t0 = time.time()
    jax.block_until_ready(run_step())
    log(f"stream step compile+first: {time.time()-t0:.1f}s")
    step_s = timeit(run_step)
    chunk_audio_s = chunk_frames * 160 / 16000.0
    capacity = int(lanes * chunk_audio_s / step_s)
    log(f"stream: {step_s*1e3:.2f} ms per {lanes}-lane chunk step "
        f"({chunk_audio_s:.2f}s audio/lane) -> ~{capacity} "
        f"real-time streams/chip")
    results.update({
        "stream_chunk_ms": round(step_s * 1e3, 2),
        "stream_lanes": lanes,
        "stream_chunk_audio_s": chunk_audio_s,
        "streams_per_chip_realtime": capacity,
    })


def _probe_backend_subprocess(timeout_s: float) -> tuple[bool, str]:
    """Probe jax.devices() in a CHILD so a tunnel hang or a cached
    backend-init failure can't poison this process (round-3 postmortem:
    jax.devices() under axon either raises UNAVAILABLE or hangs forever
    when the tunnel is down, and a failed init is cached per-process)."""
    import subprocess
    code = "import jax; d = jax.devices(); print(d[0].platform, len(d))"
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout_s:.0f}s"
    if proc.returncode == 0:
        return True, proc.stdout.strip()
    return False, (proc.stderr.strip().splitlines() or ["no stderr"])[-1]


def init_backend(max_attempts: int = 3):
    """Bounded-retry backend init. Returns the first device, or None after
    exhausting retries (axon first contact has 2-85 s variance and the
    tunnel occasionally flakes; the one run the driver gets must not die
    on a transient)."""
    for attempt in range(max_attempts):
        ok, detail = _probe_backend_subprocess(timeout_s=120.0)
        if ok:
            log(f"backend probe ok: {detail}")
            # tunnel is up; parent init is now expected to be fast, but
            # guard it anyway so a race can't hang the artifact
            try:
                with deadline(300, "parent backend init"):
                    return jax.devices()[0]
            except (Exception, _SectionTimeout) as e:  # noqa: BLE001
                detail = repr(e)
        log(f"backend init attempt {attempt + 1}/{max_attempts} failed: "
            f"{detail}")
        if attempt < max_attempts - 1:
            time.sleep(min(60.0, 10.0 * 2 ** attempt))
    return None


def main():
    dev = init_backend()
    if dev is None:
        # machine-readable failure (still rc!=0 so the round is honestly
        # red) instead of a raw traceback the driver can't parse
        print(json.dumps({
            "metric": "batch_rtfx", "value": 0.0, "unit": "x_realtime",
            "vs_baseline": 0.0, "error": "backend_unavailable",
            "detail": ("axon TPU backend failed to initialize after "
                       "bounded retries (tunnel down?)"),
        }))
        sys.exit(1)
    log(f"device: {dev} ({dev.platform})")
    results: dict = {}
    ctx = bench_batch(results)
    if ctx is not None and os.environ.get("ASR_BENCH_NO_BEAM") != "1":
        try:  # beam never blocks the headline artifact
            with deadline(
                    int(os.environ.get("ASR_BENCH_BEAM_TIMEOUT", "1800")),
                    "beam bench"):
                bench_beam(results, ctx)
        except (Exception, _SectionTimeout) as e:  # noqa: BLE001
            log(f"beam bench failed: {e!r}")
    if os.environ.get("ASR_BENCH_NO_STREAM") != "1":
        try:  # streaming never blocks the headline artifact
            with deadline(
                    int(os.environ.get("ASR_BENCH_STREAM_TIMEOUT", "1800")),
                    "streaming bench"):
                bench_streaming(results)
        except (Exception, _SectionTimeout) as e:  # noqa: BLE001
            log(f"streaming bench failed: {e!r}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
