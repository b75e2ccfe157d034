"""Train the CTC or AED family at flagship scale on synthspeech.

The serving stack gained CTC/AED as first-class served families
(runtime/family_pipeline.py); this puts TRAINED flagship-scale weights
behind them. The encoder pytree is interchangeable between families
(models/ctc.py docstring; locked by
tests/test_aed.py::test_encoder_params_interchangeable_with_transducer),
so the trained transducer flagship's encoder warm-starts the model and
only the alignment behavior + the family head (CTC: linear vocab head;
AED: transformer decoder) have to be learned — a few hundred steps
instead of a from-scratch run (and it sidesteps the deep-stack saddle
recorded in CLAUDE.md Training findings).

    python tools/train_ctc_synth.py --preset large --steps 1500 \
        --mix-long 0.5 --remat --encoder-from model-repo/large-synth-v2 \
        --ckpt-out model-repo/large-synth-ctc
    python tools/train_ctc_synth.py --family aed --steps 2000 \
        --mix-long 0.5 --remat --encoder-from model-repo/large-synth-v2 \
        --ckpt-out model-repo/large-synth-aed

The checkpoint directory is .gitignored (a ~400M-param orbax tree);
model-repo/<name>.json is the committed pointer + recipe + quality
record (family field).
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


def _token_er(ref, hyp):
    import numpy as np
    m, n = len(ref), len(hyp)
    dp = np.zeros((m + 1, n + 1), np.int32)
    dp[:, 0] = np.arange(m + 1)
    dp[0, :] = np.arange(n + 1)
    for a in range(1, m + 1):
        for b in range(1, n + 1):
            c = 0 if ref[a - 1] == hyp[b - 1] else 1
            dp[a, b] = min(dp[a - 1, b] + 1, dp[a, b - 1] + 1,
                           dp[a - 1, b - 1] + c)
    return int(dp[m, n])


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--family", default="ctc", choices=["ctc", "aed"])
    parser.add_argument("--preset", default="large")
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--warmup", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--noise", type=float, default=0.02)
    parser.add_argument("--audio-bucket", type=int, default=96000)
    parser.add_argument("--label-bucket", type=int, default=24)
    parser.add_argument("--min-len", type=int, default=4)
    parser.add_argument("--max-len", type=int, default=18)
    parser.add_argument("--mix-long", type=float, default=0.0,
                        help="fraction of steps from a 30 s / 224-label "
                             "long-form stream (see train_synth.py)")
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--encoder-from", default=None,
                        help="trained TRANSDUCER checkpoint whose encoder "
                             "subtree warm-starts this model")
    parser.add_argument("--eval-utts", type=int, default=32)
    parser.add_argument("--min-acc", type=float, default=0.0)
    parser.add_argument("--ckpt-out", default="model-repo/large-synth-ctc")
    parser.add_argument("--ckpt-in", default=None)
    parser.add_argument("--log-every", type=int, default=25)
    parser.add_argument("--save-every", type=int, default=500)
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

    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    import optax

    from amira_rust_asr_server_tpu.models import (AEDModel, CTCModel,
                                                   Transducer)
    from amira_rust_asr_server_tpu.ops import log_mel_features
    from amira_rust_asr_server_tpu.ops.ctc import ctc_greedy_decode
    from amira_rust_asr_server_tpu.parallel import (aed_loss_fn,
                                                    ctc_loss_fn,
                                                    init_training,
                                                    make_train_step)
    from amira_rust_asr_server_tpu.testing.synthspeech import (
        random_token_ids, synth_token_ids, synthspeech_batches)

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    model_cls = AEDModel if args.family == "aed" else CTCModel
    loss_fn = aed_loss_fn if args.family == "aed" else ctc_loss_fn
    model = model_cls.from_preset(args.preset)
    if args.remat:
        model = dataclasses.replace(
            model, config=dataclasses.replace(model.config, remat=True))
    cfg = model.config
    warmup = min(args.warmup, max(args.steps // 10, 1))
    sched = optax.schedules.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps, end_value=args.lr * 0.1)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adamw(sched, weight_decay=1e-3))
    params, opt_state = init_training(
        model, jax.random.PRNGKey(args.seed), optimizer)
    if args.ckpt_in:
        params = model.load_checkpoint(
            os.path.abspath(args.ckpt_in), like=params)
    elif args.encoder_from:
        donor = Transducer.from_preset(args.preset).load_checkpoint(
            os.path.abspath(args.encoder_from))
        params = dict(params)
        params["encoder"] = donor["encoder"]
        del donor  # free predictor/joint
        print(f"warm-started encoder from {args.encoder_from}", flush=True)
    step = make_train_step(model, optimizer, loss=loss_fn)
    print(f"{model.param_count(params)/1e6:.1f}M params "
          f"({args.family.upper()} {args.preset})", flush=True)

    batches = synthspeech_batches(
        args.batch, audio_bucket=args.audio_bucket,
        label_bucket=args.label_bucket, seed=args.seed, noise=args.noise,
        min_len=args.min_len, max_len=args.max_len)
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
            loss_val = float(loss)
            rate = (i + 1) / (time.time() - t0)
            print(f"step {i:6d} loss {loss_val:9.4f} "
                  f"({rate:.2f} steps/s)", flush=True)
            if not np.isfinite(loss_val):
                raise SystemExit(f"diverged at step {i}")
        if args.save_every and i and i % args.save_every == 0:
            model.save_checkpoint(ckpt, params)
            print(f"checkpoint @ step {i} -> {ckpt}", flush=True)

    # -- held-out eval (training noise level — round-5 postmortem) ---------
    rng = np.random.default_rng(args.seed + 4321)

    if args.family == "aed":
        @jax.jit
        def decode(params, audio, lens):
            feats, fl = log_mel_features(audio, lens, n_mels=cfg.n_mels)
            return model.decode_greedy_cached(params, feats, fl,
                                              max_len=32)
    else:
        @jax.jit
        def decode(params, audio, lens):
            feats, fl = log_mel_features(audio, lens, n_mels=cfg.n_mels)
            enc, el = model.encode(params, feats, fl)
            return ctc_greedy_decode(model.log_probs(params, enc), el,
                                     cfg.blank_id)

    exact = 0
    tok_err = tok_all = 0
    for _ in range(args.eval_utts):
        ids = random_token_ids(rng, args.min_len, args.max_len)
        wave = synth_token_ids(ids, noise=args.noise,
                               rate=float(rng.uniform(0.85, 1.25)), rng=rng)
        wave = wave[:args.audio_bucket]
        audio = np.zeros((1, args.audio_bucket), np.float32)
        audio[0, :len(wave)] = wave
        toks, counts = decode(params, jnp.asarray(audio),
                              jnp.asarray([len(wave)], jnp.int32))
        hyp = [int(t) for t in np.asarray(toks)[0, :int(counts[0])]]
        exact += int(hyp == ids)
        tok_err += _token_er(ids, hyp)
        tok_all += len(ids)
    acc = exact / args.eval_utts
    ter = tok_err / max(tok_all, 1)
    print(f"held-out exact match: {exact}/{args.eval_utts} ({acc:.1%}); "
          f"token error rate {ter:.2%}", flush=True)

    long_ter = None
    if args.mix_long > 0.0:
        lrng = np.random.default_rng(args.seed + 8765)
        lt_err = lt_all = 0
        long_bucket = 480000

        if args.family == "aed":
            @jax.jit
            def decode_long(params, audio, lens):
                feats, fl = log_mel_features(audio, lens,
                                             n_mels=cfg.n_mels)
                return model.decode_greedy_cached(params, feats, fl,
                                                  max_len=232)
        else:
            @jax.jit
            def decode_long(params, audio, lens):
                feats, fl = log_mel_features(audio, lens,
                                             n_mels=cfg.n_mels)
                enc, el = model.encode(params, feats, fl)
                return ctc_greedy_decode(model.log_probs(params, enc),
                                         el, cfg.blank_id)

        for _ in range(8):
            parts, ids = [], []
            total = 0
            while True:
                s_ids = random_token_ids(lrng, args.min_len, args.max_len)
                w = synth_token_ids(
                    s_ids, noise=args.noise,
                    rate=float(lrng.uniform(0.85, 1.25)), rng=lrng)
                if (total + len(w) > long_bucket
                        or len(ids) + len(s_ids) > 224):
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
            lt_err += _token_er(ids, hyp)
            lt_all += len(ids)
        long_ter = lt_err / max(lt_all, 1)
        print(f"long-form (30 s) token error rate: {long_ter:.2%}",
              flush=True)

    if acc < args.min_acc:
        raise SystemExit(
            f"held-out accuracy {acc:.1%} < --min-acc {args.min_acc:.1%}")

    model.save_checkpoint(ckpt, params)
    pointer = {
        "family": args.family,
        "preset": args.preset,
        "checkpoint": os.path.relpath(ckpt, _REPO),
        "steps": args.steps,
        "recipe": " ".join(["python", "tools/train_ctc_synth.py"]
                           + _sys.argv[1:]),
        "held_out_exact_match": acc,
        "held_out_token_error_rate": ter,
    }
    if long_ter is not None:
        pointer["held_out_long_form_token_error_rate"] = long_ter
    ptr_path = os.path.join(os.path.dirname(ckpt),
                            os.path.basename(ckpt) + ".json")
    with open(ptr_path, "w", encoding="utf-8") as f:
        json.dump(pointer, f, indent=1)
    print(f"saved {ckpt} + pointer {ptr_path}", flush=True)


if __name__ == "__main__":
    main()
