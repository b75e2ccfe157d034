"""Offline file transcription CLI — the library as a batch tool, no server.

The reference is server-only (clients in examples/); a user migrating a
batch workload otherwise has to stand up the HTTP stack to transcribe a
directory of WAVs. This drives AsrPipeline directly: one process, bucketed
jitted programs, files transcribed back-to-back so every file after the
first rides warm compiles.

    python tools/transcribe.py a.wav b.wav --preset large \
        --checkpoint model-repo/large-synth-v2 --vocab model-repo/vocab.txt
    python tools/transcribe.py *.wav --decoding beam --beam-width 10 --json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_wav(path: str) -> np.ndarray:
    """16 kHz 16-bit PCM WAV -> float32 samples in [-1, 1); stereo downmixed."""
    with wave.open(path, "rb") as w:
        if w.getframerate() != 16000:
            raise ValueError(f"{path}: expected 16 kHz, got {w.getframerate()}")
        if w.getsampwidth() != 2:
            raise ValueError(f"{path}: expected 16-bit PCM")
        x = np.frombuffer(w.readframes(w.getnframes()), "<i2")
        if w.getnchannels() == 2:
            x = x.reshape(-1, 2).mean(axis=1)
        return (x / 32768.0).astype(np.float32)


def build_ctc(args):
    """CTC family: direct fused forward+decode, no pipeline needed."""
    from amira_rust_asr_server_tpu.models import CTCModel
    from amira_rust_asr_server_tpu.ops import log_mel_features
    from amira_rust_asr_server_tpu.vocab import Vocabulary
    import jax
    import jax.numpy as jnp

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    model = CTCModel.from_preset(args.preset)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    if args.checkpoint:
        params = model.load_checkpoint(args.checkpoint, like=params)
    vocab = Vocabulary.load(args.vocab)

    @jax.jit
    def run(params, audio, lens):
        feats, feat_lens = log_mel_features(
            audio, lens, n_mels=model.config.n_mels)
        return model.decode_greedy(params, feats, feat_lens)

    class _CtcRunner:
        def process_batch_samples(self, samples):
            audio = jnp.asarray(samples)[None, :]
            lens = jnp.asarray([samples.shape[0]], jnp.int32)
            toks, counts = run(params, audio, lens)
            ids = [int(t) for t in np.asarray(toks)[0][:int(counts[0])]]

            class _T:  # minimal Transcription-alike for main()'s needs
                text = vocab.decode_tokens(ids)
                tokens = ids
            return _T()

    return _CtcRunner()


def build_aed(args):
    """AED family: fused encode + autoregressive greedy decode."""
    from amira_rust_asr_server_tpu.models import AEDModel
    from amira_rust_asr_server_tpu.ops import log_mel_features
    from amira_rust_asr_server_tpu.vocab import Vocabulary
    import jax
    import jax.numpy as jnp

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    model = AEDModel.from_preset(args.preset)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    if args.checkpoint:
        params = model.load_checkpoint(args.checkpoint, like=params)
    vocab = Vocabulary.load(args.vocab)

    @jax.jit
    def run(params, audio, lens):
        feats, feat_lens = log_mel_features(
            audio, lens, n_mels=model.config.n_mels)
        if args.decoding == "beam":
            toks, counts, _ = model.decode_beam(
                params, feats, feat_lens, width=args.beam_width,
                length_penalty=0.6)
            return toks, counts
        # KV-cached decode: token-identical to decode_greedy, O(U) per step
        return model.decode_greedy_cached(params, feats, feat_lens)

    class _AedRunner:
        def process_batch_samples(self, samples):
            audio = jnp.asarray(samples)[None, :]
            lens = jnp.asarray([samples.shape[0]], jnp.int32)
            toks, counts = run(params, audio, lens)
            ids = [int(t) for t in np.asarray(toks)[0][:int(counts[0])]]

            class _T:
                text = vocab.decode_tokens(ids)
                tokens = ids
            return _T()

    return _AedRunner()


def build_pipeline(args):
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    from amira_rust_asr_server_tpu.vocab import Vocabulary
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    overrides = dict(
        model_preset=args.preset,
        decoding_mode=args.decoding,
        beam_width=args.beam_width,
        quantization=args.quant,
        warmup_on_start=False,  # files compile their own buckets on demand
    )
    if args.compute_dtype:
        overrides["compute_dtype"] = args.compute_dtype
    if args.grammar:
        overrides["beam_grammar_path"] = args.grammar
    cfg = Config(**overrides)
    model = Transducer.from_preset(args.preset)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    if args.checkpoint:
        params = model.load_checkpoint(args.checkpoint, like=params)
    vocab = Vocabulary.load(args.vocab)
    return AsrPipeline(model, params, vocab, cfg)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("files", nargs="+", help="16 kHz 16-bit PCM WAV files")
    p.add_argument("--preset", default="large")
    p.add_argument("--family", choices=["transducer", "ctc", "aed"],
                   default="transducer")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--vocab", default="model-repo/vocab.txt")
    p.add_argument("--backend", choices=["tpu", "cpu"], default="tpu")
    p.add_argument("--compute-dtype", default=None,
                   help="override serving dtype (e.g. float32 on cpu)")
    p.add_argument("--decoding", choices=["greedy", "beam"], default="greedy")
    p.add_argument("--beam-width", type=int, default=10)
    p.add_argument("--grammar", default=None,
                   help="phrase list / tabular / OpenFST-text decoding graph")
    p.add_argument("--quant", choices=["none", "int8"], default="none")
    p.add_argument("--json", action="store_true",
                   help="one JSON object per file on stdout")
    args = p.parse_args(argv)

    pipeline = {"ctc": build_ctc, "aed": build_aed}.get(
        args.family, build_pipeline)(args)
    rc = 0
    for path in args.files:
        try:
            samples = load_wav(path)
            t0 = time.perf_counter()
            tr = pipeline.process_batch_samples(samples)
            dt = time.perf_counter() - t0
        except (OSError, ValueError, wave.Error) as e:
            print(json.dumps({"file": path, "error": str(e)})
                  if args.json else f"{path}: ERROR {e}", file=sys.stderr)
            rc = 1
            continue
        secs = samples.shape[0] / 16000.0
        if args.json:
            print(json.dumps({
                "file": path, "transcription": tr.text,
                "tokens": list(map(int, tr.tokens)),
                "audio_seconds": round(secs, 3),
                "wall_seconds": round(dt, 3),
                "rtfx": round(secs / dt, 1) if dt > 0 else None}))
        else:
            print(f"{path} ({secs:.1f}s, {dt:.2f}s wall): {tr.text}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
