"""CTC-family serving benchmark on the real chip.

Mirrors bench.py's headline methodology exactly (B x 30 s synthspeech,
steady-state loop over the compiled program with device-resident inputs,
HOST-READBACK sync — axon's block_until_ready can return early, see
bench.py timeit) so the number is directly comparable to the transducer
headline. The CTC family has NO decode loop at all — encoder -> head ->
log-softmax -> fused best-path collapse is one XLA program — so this
measures the framework's cheapest-per-audio-second serving family.

    python tools/bench_ctc.py            # -> CTCBENCH_r05.json + one line

Reads model-repo/large-synth-ctc (tools/train_ctc_synth.py). Does not
edit any Pallas-stack file; compiles its own programs into the shared
persistent cache.
"""

from __future__ import annotations

import pathlib
import sys as _sys

_REPO = pathlib.Path(__file__).resolve().parents[1]
_sys.path.insert(0, str(_REPO))

import json
import os
import time


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    import numpy as np

    import bench  # repo-root bench.py: timeit + FLOP model (import-safe)
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.runtime.family_pipeline import (
        build_family_pipeline)
    from amira_rust_asr_server_tpu.testing.synthspeech import (
        random_token_ids, synth_token_ids)
    from amira_rust_asr_server_tpu.vocab import Vocabulary

    results: dict = {"bench": "ctc_family", "ts": time.time()}
    b = int(os.environ.get("ASR_BENCH_BATCH", "16"))
    secs = 30.0
    n = int(secs * 16000)
    rng = np.random.default_rng(0)

    ckpt = os.environ.get(
        "ASR_CTC_BENCH_CKPT",
        str(_REPO / "model-repo" / "large-synth-ctc"))
    vocab = Vocabulary.load(str(_REPO / "model-repo" / "vocab.txt"))

    def build(quant: str):
        cfg = Config(model_family="ctc", audio_sec_buckets=[secs],
                     batch_buckets=[b], compute_dtype="bfloat16",
                     quantization=quant, use_pallas_mel=True,
                     checkpoint_path=ckpt if os.path.isdir(ckpt) else None)
        return build_family_pipeline("ctc", "large", vocab, cfg)

    model, params, pipe = build("none")
    results["weights"] = ("trained-synthspeech" if os.path.isdir(ckpt)
                          else "random")
    mcfg = model.config

    def make_wave():
        parts, total = [], 0
        while total < n:
            w = synth_token_ids(
                random_token_ids(rng, 4, 18), noise=0.01,
                rate=float(rng.uniform(0.85, 1.25)), rng=rng)
            parts.append(w)
            total += len(w)
        return np.concatenate(parts)[:n].astype(np.float32)

    waves = [make_wave() for _ in range(b)]

    # -- dispatch-overhead calibration (same process; bench.py recipe) ----
    @jax.jit
    def trivial(x):
        return x + 1.0

    tiny = jax.device_put(jnp.zeros((8, 128), jnp.float32))
    np.asarray(trivial(tiny))
    t0 = time.time()
    for _ in range(20):
        out = trivial(tiny)
    np.asarray(out)
    overhead_s = (time.time() - t0) / 20
    results["dispatch_overhead_ms_est"] = round(overhead_s * 1e3, 2)
    if overhead_s > 0.010:
        results["tunnel_degraded"] = True

    # -- bf16 steady state --------------------------------------------------
    t0 = time.time()
    res, *_ = pipe.decode_samples_batch(waves)
    counts = np.asarray(res.counts)
    print(f"compile+first: {time.time()-t0:.1f}s; "
          f"counts={counts.tolist()}", flush=True)

    audio_dev = jax.device_put(jnp.asarray(np.stack(waves)))
    lens_dev = jax.device_put(jnp.full((b,), n, jnp.int32))
    fresh_out, fresh_state = pipe._fresh_pred()
    h0 = jax.device_put(jnp.asarray(np.tile(fresh_state[0], (1, b, 1))))
    c0 = jax.device_put(jnp.asarray(np.tile(fresh_state[1], (1, b, 1))))
    pred0 = jax.device_put(jnp.asarray(np.tile(fresh_out, (b, 1))))
    last = jax.device_put(jnp.full((b,), mcfg.blank_id, jnp.int32))
    off = jax.device_put(jnp.zeros((b,), jnp.int32))

    def run(p):
        def f():
            r, fl, el = p._fwd(
                p.params, p._pred_quant, audio_dev, lens_dev, (h0, c0),
                pred0, last, off,
                max_symbols=p.config.max_symbols_per_step,
                max_total=p.config.max_total_tokens)
            return r.counts
        return f

    full_s = bench.timeit(run(pipe))
    audio_seconds = b * secs
    rtfx = audio_seconds / full_s
    print(f"bf16 steady-state: {full_s*1e3:.1f} ms per {audio_seconds:.0f}s"
          f" audio -> RTFx {rtfx:.0f}", flush=True)

    # analytic FLOPs: encoder (minus the transducer's joint hoist) + head
    tp = (1 + n // 160 + (mcfg.subsampling_factor - 1)) \
        // mcfg.subsampling_factor
    enc_fl = bench.flops_encoder(mcfg, b, n) \
        - b * 2 * tp * mcfg.d_enc * mcfg.d_joint
    head_fl = b * 2 * tp * mcfg.d_enc * mcfg.vocab_size
    mel_fl = bench.flops_mel(b, n, mcfg.n_mels)
    total_fl = enc_fl + head_fl + mel_fl
    peak = 394e12 / 2  # bf16 MXU peak, v5e (bench.py convention)
    mfu = total_fl / full_s / peak
    results.update({
        "metric": "ctc_batch_rtfx_per_chip",
        "value": round(rtfx, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / 10.0, 2),
        "batch": b, "audio_secs": secs,
        "batch_ms": round(full_s * 1e3, 2),
        "mfu_e2e": round(mfu, 3),
        "tokens_emitted": counts[:4].tolist(),
    })

    # -- int8 W8A8 encoder ---------------------------------------------------
    try:
        _, _, pipe_q = build("int8")
        q_s = bench.timeit(run(pipe_q))
        rtfx_q = audio_seconds / q_s
        print(f"int8 steady-state: {q_s*1e3:.1f} ms -> RTFx {rtfx_q:.0f}",
              flush=True)
        results["rtfx_int8"] = round(rtfx_q, 1)
        results["batch_ms_int8"] = round(q_s * 1e3, 2)
        if rtfx_q > rtfx:
            results.update({"value": round(rtfx_q, 1),
                            "vs_baseline": round(rtfx_q / 10.0, 2),
                            "quant": "int8-w8a8",
                            "rtfx_bf16": round(rtfx, 1)})
    except Exception as e:  # noqa: BLE001 — int8 section must not kill bf16
        print(f"int8 section failed: {e!r}", flush=True)
        results["int8_error"] = repr(e)[:200]

    out_path = os.environ.get("ASR_CTC_BENCH_OUT",
                              str(_REPO / "CTCBENCH_r05.json"))
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: results[k] for k in
                      ("metric", "value", "unit", "vs_baseline")}))


if __name__ == "__main__":
    main()
