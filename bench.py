"""Benchmark: batch transcription real-time factor per chip.

Runs the flagship end-to-end pipeline (log-mel -> conformer encoder ->
on-device greedy RNN-T decode) on the real TPU chip and reports RTFx =
seconds of audio transcribed per wall-clock second.

Baseline: the reference's production throughput target is 10x real-time on
multi-core x86 + Triton GPU (ref: README.md:400, BASELINE.md), so
vs_baseline = our_RTFx / 10.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.ops import log_mel_features
    from amira_rust_asr_server_tpu.ops.greedy import greedy_decode_transducer

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    model = Transducer.from_preset("large")
    cfg = model.config
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log(f"init large model: {model.param_count(params)/1e6:.1f}M params "
        f"in {time.time()-t0:.1f}s")

    # keep random-weight decode from babbling: bias joint toward blank so
    # the decode loop mirrors realistic emission rates (calibrated: +3.0
    # yields ~1-7 tokens/s across lanes at this seed)
    params["joint"]["out"]["b"] = (
        params["joint"]["out"]["b"].at[cfg.blank_id].add(3.0))

    def forward(params, audio, audio_lens):
        feats, feat_lens = log_mel_features(audio, audio_lens,
                                            n_mels=cfg.n_mels)
        enc, enc_lens = model.encode(params, feats, feat_lens)
        res = greedy_decode_transducer(model, params, enc, enc_lens)
        return res.tokens, res.counts

    fwd = jax.jit(forward)

    b, secs = 8, 30.0
    n = int(secs * 16000)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((b, n)) * 0.1, jnp.float32)
    lens = jnp.full((b,), n, jnp.int32)

    t0 = time.time()
    tokens, counts = fwd(params, audio, lens)
    jax.block_until_ready((tokens, counts))
    log(f"compile+first run: {time.time()-t0:.1f}s; "
        f"counts={np.asarray(counts).tolist()}")

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        tokens, counts = fwd(params, audio, lens)
    jax.block_until_ready((tokens, counts))
    wall = (time.time() - t0) / iters
    audio_seconds = b * secs
    rtfx = audio_seconds / wall
    log(f"steady-state: {wall*1000:.1f} ms per batch of {audio_seconds:.0f}s "
        f"audio -> RTFx {rtfx:.0f}")

    print(json.dumps({
        "metric": "batch_rtfx_per_chip",
        "value": round(rtfx, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / 10.0, 2),
    }))


if __name__ == "__main__":
    main()
