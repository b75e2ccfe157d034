"""Quality-vs-config matrix: WER of every serving configuration against
the f32 XLA oracle, on a held-out synthspeech manifest with the trained
flagship checkpoint — the artifact proving the optimization stack
(bf16, int8, Pallas decode loop, beam) does not trade away transcription
quality (ref purpose: transcription quality at speed,
/root/reference/src/asr/pipeline.rs:21-67).

    python tools/wer_matrix.py --checkpoint model-repo/large-synth \
        --out WER_r03.json

Writes one JSON file: per-config {wer, token_er, rtfx} + the manifest
stats. Runs every config in ONE process so the compile cache and the
manifest are shared.
"""

from __future__ import annotations

import pathlib
import sys as _sys

_REPO = pathlib.Path(__file__).resolve().parents[1]
_sys.path.insert(0, str(_REPO))
_sys.path.insert(0, str(_REPO / "tools"))

import argparse
import json
import os
import time

from eval_wer import edit_distance_words, load_wav, normalize_text


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="large")
    parser.add_argument("--family", default="transducer",
                        choices=["transducer", "ctc", "aed"],
                        help="serving model family (runtime/"
                             "family_pipeline.py); transducer-only "
                             "configs are dropped automatically")
    parser.add_argument("--checkpoint", default="model-repo/large-synth")
    parser.add_argument("--vocab", default="model-repo/vocab.txt")
    parser.add_argument("--out", default="WER_r03.json")
    parser.add_argument("--n-utts", type=int, default=48)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--bucket-secs", type=float, default=6.0)
    parser.add_argument("--beam-width", type=int, default=10)
    parser.add_argument("--manifest-dir", default="/tmp/wer_manifest")
    parser.add_argument("--configs", default=None,
                        help="comma list to restrict (names below)")
    parser.add_argument("--b16-configs",
                        default="bf16_pallas,int8_pallas,int8dec_pallas",
                        help="configs ALSO run through the B=16 batched "
                             "bucket — the headline lane-blocked decode "
                             "kernel program (round-3 verdict: the "
                             "quality artifact must see the program the "
                             "bench runs; int8dec perturbs ~2/16 lanes "
                             "ONLY at B=16). '' disables.")
    parser.add_argument("--long-clips", type=int, default=6,
                        help="also decode N 30 s concatenated clips "
                             "(the reference's batch contract is up-to-"
                             "30 s utterances, config.rs:55-57) through "
                             "bf16_pallas; 0 disables")
    parser.add_argument("--long-batch", type=int, default=8)
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu); the env "
                             "var alone is NOT enough — sitecustomize "
                             "pre-bakes JAX_PLATFORMS (CLAUDE.md)")
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      str(_REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import numpy as np

    from amira_rust_asr_server_tpu.config import Config
    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.runtime import AsrPipeline
    from amira_rust_asr_server_tpu.testing.synthspeech import write_manifest
    from amira_rust_asr_server_tpu.vocab import Vocabulary

    if args.family == "ctc":
        from amira_rust_asr_server_tpu.models import CTCModel as _Model
        from amira_rust_asr_server_tpu.runtime.family_pipeline import \
            CTCPipeline as _Pipe
    elif args.family == "aed":
        from amira_rust_asr_server_tpu.models import AEDModel as _Model
        from amira_rust_asr_server_tpu.runtime.family_pipeline import \
            AEDPipeline as _Pipe
    else:
        _Model, _Pipe = Transducer, AsrPipeline
    model = _Model.from_preset(args.preset)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    params = model.load_checkpoint(os.path.abspath(args.checkpoint),
                                   like=params)
    vocab = Vocabulary.load(args.vocab)

    manifest = write_manifest(args.manifest_dir, vocab, n_utts=args.n_utts,
                              seed=20260817, noise=0.01)
    entries = [json.loads(ln) for ln in open(manifest)]
    waves = [load_wav(e["audio_filepath"]) for e in entries]
    audio_s = sum(len(w) for w in waves) / 16000.0
    print(f"{len(entries)} utts, {audio_s:.0f}s audio", flush=True)

    # the serving-config matrix: name -> Config overrides
    CONFIGS = {
        "f32_xla": dict(compute_dtype="float32", use_pallas_mel=False,
                        use_pallas_decode_loop=False,
                        use_pallas_decode_step=False),
        "bf16_xla": dict(compute_dtype="bfloat16", use_pallas_mel=False,
                         use_pallas_decode_loop=False,
                         use_pallas_decode_step=False),
        "bf16_pallas": dict(compute_dtype="bfloat16"),
        "int8_pallas": dict(compute_dtype="bfloat16", quantization="int8"),
        "int8dec_pallas": dict(compute_dtype="bfloat16",
                               quantization="int8",
                               int8_decode_weights=True),
        "beam10_bf16": dict(compute_dtype="bfloat16", decoding_mode="beam",
                            beam_width=args.beam_width),
    }
    if args.family != "transducer":
        # int8-resident DECODE weights are a transducer Pallas-kernel
        # knob; the other configs apply unchanged (the quantized encoder
        # and the beam search are family-generic)
        CONFIGS.pop("int8dec_pallas", None)
        if args.b16_configs:
            args.b16_configs = ",".join(
                c for c in args.b16_configs.split(",")
                if c.strip() != "int8dec_pallas")
    if args.configs:
        keep = {c.strip() for c in args.configs.split(",")}
        CONFIGS = {k: v for k, v in CONFIGS.items() if k in keep}

    results = {"manifest": {"n_utts": len(entries),
                            "audio_seconds": round(audio_s, 1),
                            "grammar": "synthspeech"},
               "checkpoint": args.checkpoint,
               "preset": args.preset,
               "family": args.family,
               "configs": {}}

    def run_config(name, overrides, batch, bucket_secs, cfg_entries,
                   cfg_waves):
        cfg = Config(audio_sec_buckets=[bucket_secs],
                     batch_buckets=[batch], warmup_on_start=False,
                     model_family=args.family, **overrides)
        pipe = _Pipe(model, params, vocab, cfg)
        total_err = total_words = 0
        tok_err = tok_all = 0
        t0 = time.time()
        beam = overrides.get("decoding_mode") == "beam"
        for i in range(0, len(cfg_entries), batch):
            grp = cfg_entries[i:i + batch]
            grp_waves = cfg_waves[i:i + batch]
            if beam:
                res, fls, els = pipe.decode_beam_batch(grp_waves)
                hyp_tokens = [
                    [int(t) for t in res.tokens[j, :int(res.counts[j])]]
                    for j in range(len(grp))]
            else:
                res, fl, el, _ = pipe.decode_samples_batch(grp_waves)
                hyp_tokens = [
                    [int(t) for t in np.asarray(
                        res.tokens[j, :int(res.counts[j])])]
                    for j in range(len(grp))]
            for e, hyp_ids in zip(grp, hyp_tokens):
                hyp_w = normalize_text(vocab.decode_tokens(hyp_ids))
                ref_w = normalize_text(e["text"])
                err, *_ = edit_distance_words(ref_w, hyp_w)
                total_err += err
                total_words += len(ref_w)
                # token-level error directly against the true ids
                ref_ids = e["token_ids"]
                terr, *_ = edit_distance_words(
                    [str(t) for t in ref_ids], [str(t) for t in hyp_ids])
                tok_err += terr
                tok_all += len(ref_ids)
        wall = time.time() - t0
        cfg_audio_s = sum(len(w) for w in cfg_waves) / 16000.0
        row = {"wer": round(total_err / max(total_words, 1), 4),
               "token_er": round(tok_err / max(tok_all, 1), 4),
               "rtfx": round(cfg_audio_s / wall, 1),
               "words": total_words, "tokens": tok_all,
               "batch_bucket": batch,
               "bucket_secs": bucket_secs}
        results["configs"][name] = row
        print(f"{name:20s} wer={row['wer']:.4f} "
              f"token_er={row['token_er']:.4f} rtfx={row['rtfx']} "
              f"(B={batch})", flush=True)

    for name, overrides in CONFIGS.items():
        run_config(name, overrides, args.batch, args.bucket_secs,
                   entries, waves)

    # -- the HEADLINE program: same configs through the B=16 batched
    # bucket (padding lanes inactive), the exact lane-blocked decode
    # kernel bench.py measures — quality artifacts must see the program
    # the bench runs (round-3 verdict item 5)
    if args.b16_configs:
        for name in (c.strip() for c in args.b16_configs.split(",")):
            if name in CONFIGS:
                run_config(f"{name}_b16", CONFIGS[name], 16,
                           args.bucket_secs, entries, waves)

    # -- 30 s long-form clips (the reference's batch contract,
    # config.rs:55-57): concatenated sentences, decoded through a 30 s
    # bucket; measures the RoPE-coverage story on the checkpoint
    if args.long_clips > 0:
        from amira_rust_asr_server_tpu.testing.synthspeech import (
            random_token_ids, synth_token_ids)
        lrng = np.random.default_rng(20260818)
        long_entries, long_waves = [], []
        for _ in range(args.long_clips):
            parts, ids, total = [], [], 0
            while True:
                s_ids = random_token_ids(lrng, 4, 18)
                w = synth_token_ids(
                    s_ids, noise=0.01,
                    rate=float(lrng.uniform(0.85, 1.25)), rng=lrng)
                if (total + len(w) > 480000
                        or len(ids) + len(s_ids) > 180):
                    break
                parts.append(w)
                ids.extend(s_ids)
                total += len(w)
            wave = np.concatenate(parts).astype(np.float32)
            long_entries.append({
                "text": vocab.decode_tokens(ids), "token_ids": ids})
            long_waves.append(wave)
        results["manifest"]["long_clips"] = len(long_waves)
        results["manifest"]["long_audio_seconds"] = round(
            sum(len(w) for w in long_waves) / 16000.0, 1)
        for name in ("bf16_pallas", "int8_pallas"):
            if name in CONFIGS:
                run_config(f"{name}_long30s", CONFIGS[name],
                           args.long_batch, 30.0, long_entries,
                           long_waves)

    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
