"""WER / RTFx evaluation harness.

Measures word error rate and real-time factor of the pipeline over a
manifest of utterances — the measurement harness for the north-star
"WER parity at >=10x reference RTFx" target (BASELINE.md).

Manifest format (one JSON object per line, librispeech-style):

    {"audio_filepath": "path.wav", "text": "the reference transcript"}

Usage:
    python tools/eval_wer.py manifest.jsonl --preset large \
        [--checkpoint /path/to/orbax] [--beam] [--batch 8]

Without real trained weights the WER is meaningless (random init); the
harness exists so a checkpoint drop-in immediately yields WER numbers.
"""

from __future__ import annotations

import pathlib
import sys as _sys

_sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import json
import sys
import time
import wave
from pathlib import Path
from typing import List, Tuple

import numpy as np


def edit_distance_words(ref: List[str], hyp: List[str]) -> Tuple[int, int, int, int]:
    """Word-level Levenshtein with operation counts (S, D, I)."""
    m, n = len(ref), len(hyp)
    dp = np.zeros((m + 1, n + 1), np.int32)
    dp[:, 0] = np.arange(m + 1)
    dp[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            dp[i, j] = min(dp[i - 1, j] + 1, dp[i, j - 1] + 1,
                           dp[i - 1, j - 1] + cost)
    # backtrack for S/D/I counts
    i, j = m, n
    subs = dels = ins = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i, j] == dp[i - 1, j - 1] + (
                0 if ref[i - 1] == hyp[j - 1] else 1):
            if ref[i - 1] != hyp[j - 1]:
                subs += 1
            i, j = i - 1, j - 1
        elif i > 0 and dp[i, j] == dp[i - 1, j] + 1:
            dels += 1
            i -= 1
        else:
            ins += 1
            j -= 1
    return int(dp[m, n]), subs, dels, ins


def load_wav(path: str) -> np.ndarray:
    with wave.open(path, "rb") as w:
        assert w.getframerate() == 16000, f"{path}: need 16 kHz"
        assert w.getsampwidth() == 2, f"{path}: need 16-bit"
        pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
        if w.getnchannels() == 2:
            pcm = pcm.reshape(-1, 2).mean(axis=1).astype("<i2")
    return pcm.astype(np.float32) / 32768.0


def normalize_text(s: str) -> List[str]:
    return "".join(c.lower() if c.isalnum() or c.isspace() else " "
                   for c in s).split()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("manifest")
    parser.add_argument("--preset", default="large")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--vocab", default="model-repo/vocab.txt")
    parser.add_argument("--beam", action="store_true")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args()

    import jax
    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    from amira_rust_asr_server_tpu.vocab import Vocabulary

    model = Transducer.from_preset(args.preset)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    if args.checkpoint:
        params = model.load_checkpoint(args.checkpoint, like=params)
    vocab = Vocabulary.load(args.vocab)
    cfg = Config(decoding_mode="beam" if args.beam else "greedy")
    pipe = AsrPipeline(model, params, vocab, cfg)

    entries = []
    with open(args.manifest) as f:
        for line in f:
            if line.strip():
                entries.append(json.loads(line))
    if args.limit:
        entries = entries[:args.limit]
    print(f"{len(entries)} utterances", file=sys.stderr)

    total_err = total_words = 0
    total_audio_s = 0.0
    t0 = time.time()
    for i in range(0, len(entries), args.batch):
        group = entries[i:i + args.batch]
        waves = [load_wav(e["audio_filepath"]) for e in group]
        total_audio_s += sum(w.shape[0] for w in waves) / 16000.0
        if args.beam or len(waves) == 1:
            hyps = [pipe.process_batch_samples(w).text for w in waves]
        else:
            res, fl, el, _ = pipe.decode_samples_batch(waves)
            hyps = []
            for lane in range(len(waves)):
                c = int(res.counts[lane])
                toks = [int(t) for t in np.asarray(res.tokens[lane, :c])]
                hyps.append(vocab.decode_tokens(toks))
        for e, hyp in zip(group, hyps):
            ref_w = normalize_text(e["text"])
            hyp_w = normalize_text(hyp)
            err, *_ = edit_distance_words(ref_w, hyp_w)
            total_err += err
            total_words += len(ref_w)
    wall = time.time() - t0

    wer = total_err / max(total_words, 1)
    rtfx = total_audio_s / wall
    print(json.dumps({
        "wer": round(wer, 4),
        "words": total_words,
        "audio_seconds": round(total_audio_s, 1),
        "wall_seconds": round(wall, 1),
        "rtfx": round(rtfx, 1),
    }))


if __name__ == "__main__":
    main()
