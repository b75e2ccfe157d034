"""Streaming-beam chunk-step latency on the real chip.

Measures the round-5 parity-plus feature: beam search whose hypotheses
survive chunk boundaries (runtime/beam_stream.py). The reference's k2
beam backend is batch-only (ref: src/triton_backends/k2_decoder/
k2_decoder_backend.cc:63-253) and its streaming path re-decodes overlaps
and weaves text (ref: src/asr/incremental.rs:37-298); here ONE fused
device program per chunk advances K carried hypotheses, so the steady-
state per-chunk latency IS the streaming-beam serving cost.

    python tools/bench_stream_beam.py --out STREAMBEAM_r05.json

Loads model-repo/large-synth-stream when present (trained causal
checkpoint) so emission rates are speech-like; stamps the weights
provenance either way. Feeds one 30 s synthspeech stream in 0.64 s
chunks, times warm steady-state feed() (device chunk program + host
backtrace splice), and checks the final transcript against the truth
tokens — a latency number is only meaningful if the session transcribes.
"""

from __future__ import annotations

import pathlib
import sys as _sys

_REPO = pathlib.Path(__file__).resolve().parents[1]
_sys.path.insert(0, str(_REPO))

import argparse
import json
import time

import numpy as np


def token_edit_distance(ref, hyp) -> int:
    m, n = len(ref), len(hyp)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ref[i - 1] != hyp[j - 1]))
        prev = cur
    return prev[n]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="large-streaming")
    parser.add_argument("--vocab", default=str(_REPO / "model-repo"
                                               / "vocab.txt"))
    parser.add_argument("--checkpoint",
                        default=str(_REPO / "model-repo"
                                    / "large-synth-stream"))
    parser.add_argument("--beam-width", type=int, default=10)
    parser.add_argument("--chunk-frames", type=int, default=64)
    parser.add_argument("--stream-secs", type=float, default=30.0)
    parser.add_argument("--warm-chunks", type=int, default=4)
    parser.add_argument("--out", default="STREAMBEAM_r05.json")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.runtime.beam_stream import \
        StreamingBeamSession
    from amira_rust_asr_server_tpu.testing.synthspeech import (
        random_token_ids, synth_token_ids)
    from amira_rust_asr_server_tpu.vocab import Vocabulary

    model = Transducer.from_preset(args.preset)
    cfg = model.config
    vocab = Vocabulary.load(args.vocab)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    ckpt = pathlib.Path(args.checkpoint)
    if ckpt.is_dir():
        params = model.load_checkpoint(str(ckpt), like=params)
        weights = "trained-synthspeech"
        print(f"loaded trained causal checkpoint {ckpt}", flush=True)
    else:
        params["joint"]["out"]["b"] = (
            params["joint"]["out"]["b"].at[cfg.blank_id].add(6.0))
        weights = "random+blank-bias"
        print("WARNING: no trained causal checkpoint; random weights — "
              "latency is real, transcript check is vacuous", flush=True)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)

    # one continuous synthspeech stream with known truth tokens
    rng = np.random.default_rng(7)
    n_samples = int(args.stream_secs * 16000)
    truth, parts, total = [], [], 0
    while total < n_samples:
        ids = random_token_ids(rng, 4, 18)
        w = synth_token_ids(ids, noise=0.01, rng=rng)
        truth.extend(ids)
        parts.append(w)
        total += len(w)
    audio = np.concatenate(parts)[:n_samples].astype(np.float32)

    sess = StreamingBeamSession(model, params, vocab,
                                chunk_frames=args.chunk_frames,
                                beam_width=args.beam_width)
    hop = args.chunk_frames * 160  # one encoder chunk of PCM per feed
    n_chunks = n_samples // hop
    per_chunk_ms = []
    t_all0 = time.time()
    for i in range(n_chunks):
        seg = audio[i * hop:(i + 1) * hop]
        t0 = time.time()
        sess.feed(seg, final=False)
        dt = time.time() - t0
        if i == 0:
            print(f"first chunk (compile): {dt:.1f}s", flush=True)
        if i >= args.warm_chunks:
            per_chunk_ms.append(dt * 1e3)
    result_t = sess.end()
    wall_s = time.time() - t_all0

    per = np.array(per_chunk_ms)
    chunk_audio_s = hop / 16000.0
    p50 = float(np.percentile(per, 50))
    ter = (token_edit_distance(truth, result_t.tokens)
           / max(len(truth), 1))
    out = {
        "beam_width": args.beam_width,
        "chunk_frames": args.chunk_frames,
        "chunk_audio_s": chunk_audio_s,
        "chunks_timed": int(per.size),
        "chunk_ms_p50": round(p50, 2),
        "chunk_ms_mean": round(float(per.mean()), 2),
        "chunk_ms_p95": round(float(np.percentile(per, 95)), 2),
        "rt_factor_per_stream": round(chunk_audio_s / (p50 / 1e3), 1),
        "stream_secs": args.stream_secs,
        "wall_s": round(wall_s, 1),
        "weights": weights,
        "truth_tokens": len(truth),
        "hyp_tokens": len(result_t.tokens),
        "token_er": round(ter, 4),
        "final_score": result_t.score,
        "note": "B=1 premium mode; greedy lane engine is the capacity "
                "path (bench.py streams_per_chip_realtime)",
    }
    print(json.dumps(out), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
