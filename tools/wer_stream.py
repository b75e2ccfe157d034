"""Streaming-path WER: transcription quality of the NATIVE serving modes
on a held-out synthspeech manifest with the trained causal checkpoint.

The batch quality matrix (tools/wer_matrix.py) proves the offline
configs don't trade quality for speed; this artifact proves the same for
the paths a live WebSocket stream actually rides:

- greedy lanes: the shared StreamingLaneEngine (streaming_mode=native
  serving default) with utterances interleaved across concurrent lanes —
  the multiplexed chunked-encoder + carried-decode-state program
- streaming beam: StreamingBeamSession (decoding_mode=beam + native),
  K carried hypotheses across chunks

Reference contrast: its streaming path re-decodes chunk overlaps and
weaves text (ref: src/asr/incremental.rs:37-298) — transcript quality of
chunked serving there depends on weave heuristics; here the carried
state makes chunked decode exact, and this artifact measures it
end-to-end (PCM -> stateful featurizer -> chunked causal encode ->
carried decode -> text).

    python tools/wer_stream.py --out STREAMWER_r05.json
"""

from __future__ import annotations

import pathlib
import sys as _sys

_REPO = pathlib.Path(__file__).resolve().parents[1]
_sys.path.insert(0, str(_REPO))
_sys.path.insert(0, str(_REPO / "tools"))

import argparse
import json

import numpy as np

from eval_wer import edit_distance_words, load_wav, normalize_text


def _token_edits(ref, hyp) -> int:
    m, n = len(ref), len(hyp)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ref[i - 1] != hyp[j - 1]))
        prev = cur
    return prev[n]


def _score(pairs) -> dict:
    """pairs: list of (truth_text, truth_ids, hyp_text, hyp_ids)."""
    werr = wtot = terr = ttot = exact = 0
    for truth, tids, hyp, hids in pairs:
        rw, hw = normalize_text(truth), normalize_text(hyp)
        e, _, _, _ = edit_distance_words(rw, hw)
        werr += e
        wtot += len(rw)
        terr += _token_edits(tids, hids)
        ttot += len(tids)
        exact += int(list(tids) == list(hids))
    return {"wer": round(werr / max(wtot, 1), 4),
            "token_er": round(terr / max(ttot, 1), 4),
            "exact": round(exact / max(len(pairs), 1), 4),
            "utts": len(pairs)}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="large-streaming")
    parser.add_argument("--checkpoint",
                        default=str(_REPO / "model-repo"
                                    / "large-synth-stream"))
    parser.add_argument("--vocab", default=str(_REPO / "model-repo"
                                               / "vocab.txt"))
    parser.add_argument("--n-utts", type=int, default=48)
    parser.add_argument("--beam-utts", type=int, default=8,
                        help="utterances through the (B=1) streaming "
                             "beam session; 0 disables")
    parser.add_argument("--beam-width", type=int, default=10)
    # 64 matches bench.py's streaming segment so the lane-engine chunk
    # program is a .jax_cache hit instead of a fresh remote compile
    parser.add_argument("--lanes", type=int, default=64)
    parser.add_argument("--chunk-frames", type=int, default=64)
    parser.add_argument("--manifest-dir", default="/tmp/wer_stream_manifest")
    parser.add_argument("--norm", default="stream",
                        choices=["stream", "none"],
                        help="featurizer normalization; trained "
                             "checkpoints consumed RAW log-mel in "
                             "training, so 'stream' is a train/serve "
                             "mismatch — this flag exists to measure it")
    parser.add_argument("--out", default="STREAMWER_r05.json")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      str(_REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.runtime.beam_stream import \
        StreamingBeamSession
    from amira_rust_asr_server_tpu.runtime.lane_engine import \
        StreamingLaneEngine
    from amira_rust_asr_server_tpu.testing.synthspeech import write_manifest
    from amira_rust_asr_server_tpu.vocab import Vocabulary

    vocab = Vocabulary.load(args.vocab)
    manifest = write_manifest(args.manifest_dir, vocab,
                              n_utts=args.n_utts)
    utts = [json.loads(line)
            for line in open(manifest, encoding="utf-8")]

    model = Transducer.from_preset(args.preset)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    ckpt = pathlib.Path(args.checkpoint)
    weights = "random"
    if ckpt.is_dir():
        params = model.load_checkpoint(str(ckpt), like=params)
        weights = "trained-synthspeech"
        print(f"loaded trained causal checkpoint {ckpt}", flush=True)
    else:
        print("WARNING: no trained causal checkpoint — scores will be "
              "noise; artifact marked accordingly", flush=True)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)

    out = {"checkpoint": str(ckpt), "weights": weights,
           "norm": args.norm,
           "preset": args.preset, "chunk_frames": args.chunk_frames}

    # ---- greedy lanes: interleave utterances across concurrent lanes so
    # every tick advances many lanes (the serving access pattern)
    engine = StreamingLaneEngine(model, params, vocab,
                                 n_lanes=args.lanes,
                                 chunk_frames=args.chunk_frames,
                                 norm=args.norm)
    engine.warm()
    hop = args.chunk_frames * 160
    pairs = []
    queue = list(utts)
    live = {}  # lane -> (utt, audio, pos)
    while queue or live:
        while queue and len(live) < args.lanes:
            lane = engine.attach()
            if lane is None:
                break
            u = queue.pop(0)
            live[lane] = [u, load_wav(u["audio_filepath"]), 0]
        for lane in list(live):
            u, audio, pos = live[lane]
            seg = audio[pos:pos + hop]
            final = pos + hop >= len(audio)
            engine.feed(lane, seg, final=final)
            live[lane][2] = pos + hop
        engine.tick()
        for lane in list(live):
            u, audio, pos = live[lane]
            if pos >= len(audio):
                hyp = engine.drain(lane)
                hids = list(engine.tokens[lane])
                engine.detach(lane)
                pairs.append((u["text"], u["token_ids"], hyp, hids))
                del live[lane]
    out["greedy_lanes"] = dict(_score(pairs), lanes=args.lanes)
    print("greedy lanes:", out["greedy_lanes"], flush=True)

    # ---- streaming beam (B=1 premium mode)
    if args.beam_utts > 0:
        pairs = []
        for u in utts[:args.beam_utts]:
            sess = StreamingBeamSession(model, params, vocab,
                                        chunk_frames=args.chunk_frames,
                                        beam_width=args.beam_width,
                                        norm=args.norm)
            audio = load_wav(u["audio_filepath"])
            for pos in range(0, len(audio), hop):
                sess.feed(audio[pos:pos + hop], final=False)
            t = sess.end()
            pairs.append((u["text"], u["token_ids"], t.text, t.tokens))
        out["beam_stream"] = dict(_score(pairs),
                                  beam_width=args.beam_width)
        print("beam stream:", out["beam_stream"], flush=True)

    print(json.dumps(out), flush=True)
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
