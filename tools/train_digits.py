"""Train the tiny preset to convergence on the spoken-digits grammar and
commit-able orbax checkpoint + vocab, giving the repo a real end-to-end
"audio in, correct text out" artifact (the reference's ONNX weights are
placeholders, so it has no equivalent).

    python tools/train_digits.py --steps 800 \
        --ckpt-out model-repo/tiny-digits \
        --vocab-out model-repo/tiny-digits-vocab.txt

Runs on CPU by default (tiny model; avoids TPU-tunnel dispatch latency).
Exits nonzero if held-out exact-match accuracy is below --min-acc.
"""

from __future__ import annotations

import pathlib
import sys as _sys

_sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import os
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--family", choices=["transducer", "ctc", "aed"],
                        default="transducer")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--lr", type=float, default=2e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--noise", type=float, default=0.02)
    # Long-sentence coverage keeps the prediction-net state healthy deep
    # into a stream: a model trained only on short utterances learns
    # "after ~6 tokens, blank forever", which collapses carried-state
    # window re-decodes in the chunked streaming mode.
    parser.add_argument("--min-words", type=int, default=2)
    parser.add_argument("--max-words", type=int, default=14)
    parser.add_argument("--audio-bucket", type=int, default=80000)
    parser.add_argument("--label-bucket", type=int, default=16)
    parser.add_argument("--eval-sentences", type=int, default=50)
    parser.add_argument("--min-acc", type=float, default=1.0)
    parser.add_argument("--ckpt-out", default="model-repo/tiny-digits")
    parser.add_argument("--vocab-out",
                        default="model-repo/tiny-digits-vocab.txt")
    parser.add_argument("--platform", default="cpu",
                        help="cpu (default) or empty for ambient backend")
    parser.add_argument("--log-every", type=int, default=25)
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.ops import log_mel_features
    from amira_rust_asr_server_tpu.ops.greedy import greedy_decode_transducer
    from amira_rust_asr_server_tpu.parallel import (init_training,
                                                    make_optimizer,
                                                    make_train_step)
    from amira_rust_asr_server_tpu.testing import (digit_batches,
                                                   digits_vocab_map,
                                                   random_sentence,
                                                   synth_digits,
                                                   write_digits_vocab)
    from amira_rust_asr_server_tpu.vocab import Vocabulary

    import optax
    if args.family == "ctc":
        from amira_rust_asr_server_tpu.models import CTCModel
        from amira_rust_asr_server_tpu.parallel import ctc_loss_fn
        model = CTCModel.from_preset("tiny")
        step_loss = ctc_loss_fn
    elif args.family == "aed":
        from amira_rust_asr_server_tpu.models import AEDModel
        from amira_rust_asr_server_tpu.parallel import aed_loss_fn
        model = AEDModel.from_preset("tiny")
        step_loss = aed_loss_fn
    else:
        model = Transducer.from_preset("tiny")
        from amira_rust_asr_server_tpu.parallel import loss_fn as step_loss
    # cosine decay to lr/10 sharpens the convergence tail (repeat-count
    # boundaries are the last thing the model gets right)
    sched = optax.schedules.warmup_cosine_decay_schedule(
        0.0, args.lr, 100, args.steps, end_value=args.lr * 0.1)
    optimizer = make_optimizer(lr=sched)
    params, opt_state = init_training(
        model, jax.random.PRNGKey(args.seed), optimizer)
    step = make_train_step(model, optimizer, loss=step_loss)
    print(f"{model.param_count(params)/1e6:.2f}M params "
          f"(tiny {args.family})")

    audio_bucket = args.audio_bucket
    batches = digit_batches(args.batch, audio_bucket=audio_bucket,
                            label_bucket=args.label_bucket,
                            seed=args.seed, noise=args.noise,
                            min_words=args.min_words,
                            max_words=args.max_words)
    t0 = time.time()
    for i, batch in enumerate(batches):
        if i >= args.steps:
            break
        params, opt_state, loss = step(params, opt_state, batch)
        if i % args.log_every == 0 or i == args.steps - 1:
            rate = (i + 1) / (time.time() - t0)
            print(f"step {i:5d} loss {float(loss):8.4f} ({rate:.2f} steps/s)",
                  flush=True)

    # -- held-out evaluation (different seed, lighter noise) ----------------
    vocab = Vocabulary.from_map(digits_vocab_map())
    rng = np.random.default_rng(args.seed + 1234)

    @jax.jit
    def decode(params, audio, lens):
        feats, feat_lens = log_mel_features(audio, lens,
                                            n_mels=model.config.n_mels)
        if args.family == "ctc":
            return model.decode_greedy(params, feats, feat_lens)
        if args.family == "aed":
            return model.decode_greedy(params, feats, feat_lens,
                                       max_len=args.label_bucket + 4)
        enc, enc_lens = model.encode(params, feats, feat_lens)
        res = greedy_decode_transducer(model, params, enc, enc_lens)
        return res.tokens, res.counts

    correct = 0
    misses = []
    for _ in range(args.eval_sentences):
        words = random_sentence(rng, args.min_words, args.max_words)
        wave = synth_digits(words, noise=0.005, rng=rng)
        audio = np.zeros((1, audio_bucket), np.float32)
        audio[0, :len(wave)] = wave
        tokens, counts = decode(params, audio,
                                np.array([len(wave)], np.int32))
        ids = np.asarray(tokens)[0, :int(counts[0])]
        hyp = vocab.decode_tokens(ids)
        ref = " ".join(words)
        if hyp == ref:
            correct += 1
        elif len(misses) < 5:
            misses.append((ref, hyp))
    acc = correct / args.eval_sentences
    print(f"held-out exact match: {correct}/{args.eval_sentences} "
          f"({acc:.1%})")
    for ref, hyp in misses:
        print(f"  MISS ref={ref!r} hyp={hyp!r}")

    if acc < args.min_acc:
        print(f"accuracy {acc:.1%} below --min-acc {args.min_acc:.1%}; "
              f"not saving")
        raise SystemExit(1)

    ckpt = os.path.abspath(args.ckpt_out)
    model.save_checkpoint(ckpt, params)
    write_digits_vocab(args.vocab_out)
    print(f"saved checkpoint to {ckpt} and vocab to {args.vocab_out}")


if __name__ == "__main__":
    main()
