"""Train a flagship-contract model on the synthspeech grammar (the REAL
1025-token vocab rendered as unique two-formant tones; see
testing/synthspeech.py) and save an orbax checkpoint + held-out accuracy
report.

This puts TRAINED weights under bench.py's headline (realistic emission
rates instead of a hand-tuned blank bias on random weights) and gives
tools/eval_wer.py a real model to measure the optimization stack's WER
deltas against (f32 XLA vs bf16 vs int8 vs Pallas loop vs beam).

    # flagship on the real chip (~25 min at ~2 steps/s after compile)
    python tools/train_synth.py --preset large --steps 3000 \
        --ckpt-out model-repo/large-synth

The checkpoint directory is .gitignored (a 421M-param orbax tree);
model-repo/large-synth.json is the committed pointer + regeneration
recipe + quality record.
"""

from __future__ import annotations

import pathlib
import sys as _sys

_REPO = pathlib.Path(__file__).resolve().parents[1]
_sys.path.insert(0, str(_REPO))

import argparse
import json
import os
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="large")
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--warmup", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--noise", type=float, default=0.02)
    parser.add_argument("--audio-bucket", type=int, default=96000)
    parser.add_argument("--label-bucket", type=int, default=24)
    parser.add_argument("--min-len", type=int, default=4)
    parser.add_argument("--max-len", type=int, default=18)
    parser.add_argument("--eval-utts", type=int, default=32)
    parser.add_argument("--long-form", action="store_true",
                        help="concatenate sentences to fill the audio "
                             "bucket (serving distribution for 30 s "
                             "clips); use with --audio-bucket 480000 "
                             "--label-bucket 224")
    parser.add_argument("--mix-long", type=float, default=0.0,
                        help="fraction of steps drawn from a long-form "
                             "(30 s / 224-label) stream alongside the "
                             "short single-sentence stream — trains both "
                             "distributions (two compiled programs); "
                             "pure long-form fine-tuning forgets short "
                             "utterances (measured 75%% -> 25%% exact)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize conformer blocks (needed for "
                             "30 s training buckets on one chip)")
    parser.add_argument("--min-acc", type=float, default=0.0,
                        help="exit nonzero (and skip saving) below this "
                             "held-out exact-match accuracy")
    parser.add_argument("--ckpt-out", default="model-repo/large-synth")
    parser.add_argument("--ckpt-in", default=None,
                        help="resume from an existing checkpoint")
    parser.add_argument("--log-every", type=int, default=25)
    parser.add_argument("--save-every", type=int, default=1000)
    args = parser.parse_args()

    import jax

    # flagship programs take minutes via the remote compile service;
    # persist compiles alongside bench.py's cache
    jax.config.update("jax_compilation_cache_dir",
                      str(_REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.ops import log_mel_features
    from amira_rust_asr_server_tpu.ops.greedy import greedy_decode_transducer
    from amira_rust_asr_server_tpu.parallel import (init_training,
                                                    make_train_step)
    from amira_rust_asr_server_tpu.testing.synthspeech import (
        random_token_ids, synth_token_ids, synthspeech_batches)

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    model = Transducer.from_preset(args.preset)
    if args.remat:
        import dataclasses

        from amira_rust_asr_server_tpu.models import Transducer as _T
        model = _T(dataclasses.replace(model.config, remat=True))
    cfg = model.config
    sched = optax.schedules.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, args.steps, end_value=args.lr * 0.1)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adamw(sched, weight_decay=1e-3))
    params, opt_state = init_training(
        model, jax.random.PRNGKey(args.seed), optimizer)
    if args.ckpt_in:
        params = model.load_checkpoint(
            os.path.abspath(args.ckpt_in), like=params)
    step = make_train_step(model, optimizer)
    print(f"{model.param_count(params)/1e6:.1f}M params ({args.preset})",
          flush=True)

    batches = synthspeech_batches(
        args.batch, audio_bucket=args.audio_bucket,
        label_bucket=args.label_bucket, seed=args.seed, noise=args.noise,
        min_len=args.min_len, max_len=args.max_len,
        long_form=args.long_form)
    batches_long = None
    if args.mix_long > 0.0:
        batches_long = synthspeech_batches(
            args.batch, audio_bucket=480000, label_bucket=224,
            seed=args.seed + 7, noise=args.noise, min_len=args.min_len,
            max_len=args.max_len, long_form=True)
    mix_rng = np.random.default_rng(args.seed + 99)

    ckpt = os.path.abspath(args.ckpt_out)
    t0 = time.time()
    for i in range(args.steps):
        take_long = (batches_long is not None
                     and mix_rng.random() < args.mix_long)
        batch = next(batches_long if take_long else batches)
        params, opt_state, loss = step(params, opt_state, batch)
        if i % args.log_every == 0 or i == args.steps - 1:
            loss_val = float(loss)  # device sync
            rate = (i + 1) / (time.time() - t0)
            audio_rtfx = rate * args.batch * args.audio_bucket / 16000.0
            print(f"step {i:6d} loss {loss_val:9.4f} "
                  f"({rate:.2f} steps/s, ~{audio_rtfx:.0f}x rt)",
                  flush=True)
            if not np.isfinite(loss_val):
                raise SystemExit(f"diverged at step {i}")
        if args.save_every and i and i % args.save_every == 0:
            model.save_checkpoint(ckpt, params)
            print(f"checkpoint @ step {i} -> {ckpt}", flush=True)

    # -- held-out eval: exact token match + token error rate ---------------
    # Eval audio MUST use the TRAINING noise level: the round-5 postmortem
    # measured exact-match 31/32 (TER 0.27%) at the training noise=0.02 vs
    # 19/32 (TER 5.45%) at a hard-coded 0.005 on the SAME checkpoint and
    # utterances — cleaner-than-trained audio shifts the log-mel noise
    # floor in the inter-token gaps out of distribution, so the old
    # mismatch systematically understated every checkpoint it recorded.
    rng = np.random.default_rng(args.seed + 4321)

    @jax.jit
    def decode(params, audio, lens):
        feats, fl = log_mel_features(audio, lens, n_mels=cfg.n_mels)
        enc, el = model.encode(params, feats, fl)
        res = greedy_decode_transducer(model, params, enc, el)
        return res.tokens, res.counts

    exact = 0
    tok_err = tok_all = 0
    for _ in range(args.eval_utts):
        ids = random_token_ids(rng, args.min_len, args.max_len)
        wave = synth_token_ids(ids, noise=args.noise,
                               rate=float(rng.uniform(0.85, 1.25)), rng=rng)
        audio = np.zeros((1, args.audio_bucket), np.float32)
        audio[0, :len(wave)] = wave
        toks, counts = decode(params, jnp.asarray(audio),
                              jnp.asarray([len(wave)], jnp.int32))
        hyp = [int(t) for t in np.asarray(toks)[0, :int(counts[0])]]
        if hyp == ids:
            exact += 1
        # token-level levenshtein
        m, n = len(ids), len(hyp)
        dp = np.zeros((m + 1, n + 1), np.int32)
        dp[:, 0] = np.arange(m + 1)
        dp[0, :] = np.arange(n + 1)
        for a in range(1, m + 1):
            for bb in range(1, n + 1):
                c = 0 if ids[a - 1] == hyp[bb - 1] else 1
                dp[a, bb] = min(dp[a - 1, bb] + 1, dp[a, bb - 1] + 1,
                                dp[a - 1, bb - 1] + c)
        tok_err += int(dp[m, n])
        tok_all += m
    acc = exact / args.eval_utts
    ter = tok_err / max(tok_all, 1)
    print(f"held-out exact match: {exact}/{args.eval_utts} ({acc:.1%}); "
          f"token error rate {ter:.2%}", flush=True)

    # -- long-form eval (serving distribution: 30 s concatenated clips) ----
    long_ter = None
    if args.long_form or args.mix_long > 0.0:
        lrng = np.random.default_rng(args.seed + 8765)
        lt_err = lt_all = 0
        long_bucket = 480000

        @jax.jit
        def decode_long(params, audio, lens):
            feats, fl = log_mel_features(audio, lens, n_mels=cfg.n_mels)
            enc, el = model.encode(params, feats, fl)
            res = greedy_decode_transducer(model, params, enc, el,
                                           max_total=400)
            return res.tokens, res.counts

        for _ in range(8):
            parts, ids = [], []
            total = 0
            while True:
                s_ids = random_token_ids(lrng, args.min_len, args.max_len)
                w = synth_token_ids(
                    s_ids, noise=args.noise,
                    rate=float(lrng.uniform(0.85, 1.25)), rng=lrng)
                if total + len(w) > long_bucket or len(ids) + len(s_ids) > 224:
                    break
                parts.append(w)
                ids.extend(s_ids)
                total += len(w)
            wave = np.concatenate(parts)
            audio = np.zeros((1, long_bucket), np.float32)
            audio[0, :len(wave)] = wave
            toks, counts = decode_long(
                params, jnp.asarray(audio),
                jnp.asarray([len(wave)], jnp.int32))
            hyp = [int(t) for t in np.asarray(toks)[0, :int(counts[0])]]
            m, n = len(ids), len(hyp)
            dp = np.zeros((m + 1, n + 1), np.int32)
            dp[:, 0] = np.arange(m + 1)
            dp[0, :] = np.arange(n + 1)
            for a in range(1, m + 1):
                for bb in range(1, n + 1):
                    c = 0 if ids[a - 1] == hyp[bb - 1] else 1
                    dp[a, bb] = min(dp[a - 1, bb] + 1, dp[a, bb - 1] + 1,
                                    dp[a - 1, bb - 1] + c)
            lt_err += int(dp[m, n])
            lt_all += m
        long_ter = lt_err / max(lt_all, 1)
        print(f"long-form (30 s) token error rate: {long_ter:.2%} "
              f"({lt_all} tokens)", flush=True)

    if acc < args.min_acc:
        print(f"accuracy {acc:.1%} below --min-acc; not saving")
        raise SystemExit(1)

    model.save_checkpoint(ckpt, params)
    pointer = {
        "preset": args.preset,
        "checkpoint": os.path.relpath(ckpt, _REPO),
        "grammar": "testing/synthspeech.py (1025-token vocab, 32x32 "
                   "two-formant grid)",
        "recipe": (f"python tools/train_synth.py --preset {args.preset} "
                   f"--steps {args.steps} --batch {args.batch} "
                   f"--lr {args.lr} --warmup {args.warmup} "
                   f"--seed {args.seed}"
                   + (f" --mix-long {args.mix_long}" if args.mix_long else "")
                   + (" --long-form" if args.long_form else "")
                   + (" --remat" if args.remat else "")),
        "steps": args.steps,
        "held_out_exact_match": round(acc, 4),
        "held_out_token_error_rate": round(ter, 4),
        "eval_utts": args.eval_utts,
    }
    if long_ter is not None:
        pointer["held_out_long_form_token_error_rate"] = round(long_ter, 4)
    with open(ckpt + ".json", "w", encoding="utf-8") as f:
        json.dump(pointer, f, indent=2)
    print(f"saved checkpoint to {ckpt} (+ pointer {ckpt}.json)")


if __name__ == "__main__":
    main()
