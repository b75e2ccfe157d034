"""Training driver: RNN-T training with DP/TP sharding and orbax saves.

    # smoke train on synthetic data, tiny model, all visible devices
    python tools/train.py --preset tiny --steps 50 --synthetic

    # real data
    python tools/train.py --preset large --manifest train.jsonl \
        --vocab model-repo/vocab.txt --steps 10000 \
        --ckpt-out /models/ckpt --mesh data=4,model=2
"""

from __future__ import annotations

import pathlib
import sys as _sys

_sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import time


def parse_mesh(spec: str):
    out = {}
    for part in spec.split(","):
        if part:
            k, v = part.split("=")
            out[k.strip()] = int(v)
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="tiny")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--audio-bucket-secs", type=float, default=2.0)
    parser.add_argument("--label-bucket", type=int, default=32)
    parser.add_argument("--manifest", default=None)
    parser.add_argument("--vocab", default="model-repo/vocab.txt")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--mesh", default=None,
                        help="e.g. data=4,model=2 (default: all-data)")
    parser.add_argument("--ckpt-out", default=None)
    parser.add_argument("--ckpt-in", default=None)
    parser.add_argument("--log-every", type=int, default=10)
    args = parser.parse_args()

    import jax
    from amira_rust_asr_server_tpu.models import Transducer
    from amira_rust_asr_server_tpu.parallel import (init_training, make_mesh,
                                                    make_optimizer,
                                                    make_train_step)
    from amira_rust_asr_server_tpu.parallel.data import (manifest_batches,
                                                         synthetic_batches)
    from amira_rust_asr_server_tpu.vocab import Vocabulary

    model = Transducer.from_preset(args.preset)
    cfg = model.config
    optimizer = make_optimizer(lr=args.lr)

    mesh = None
    if len(jax.devices()) > 1:
        mesh = make_mesh(parse_mesh(args.mesh) if args.mesh else None)
        print(f"mesh: {dict(mesh.shape)}")
    params, opt_state = init_training(
        model, jax.random.PRNGKey(0), optimizer, mesh)
    if args.ckpt_in:
        params = model.load_checkpoint(args.ckpt_in, like=params)
    print(f"{model.param_count(params)/1e6:.1f}M params")

    if mesh is not None:
        step = make_train_step(model, optimizer, mesh)(params, opt_state)
    else:
        step = make_train_step(model, optimizer)

    audio_bucket = int(args.audio_bucket_secs * 16000)
    if args.synthetic or not args.manifest:
        batches = synthetic_batches(args.batch, audio_bucket,
                                    args.label_bucket, cfg.vocab_size,
                                    cfg.blank_id)
    else:
        vocab = Vocabulary.load(args.vocab)
        batches = manifest_batches(args.manifest, vocab, args.batch,
                                   audio_bucket, args.label_bucket)

    t0 = time.time()
    for i, batch in enumerate(batches):
        if i >= args.steps:
            break
        params, opt_state, loss = step(params, opt_state, batch)
        if i % args.log_every == 0 or i == args.steps - 1:
            rate = (i + 1) / (time.time() - t0)
            print(f"step {i:6d} loss {float(loss):9.4f} "
                  f"({rate:.2f} steps/s)")

    if args.ckpt_out:
        model.save_checkpoint(args.ckpt_out, params)
        print(f"saved checkpoint to {args.ckpt_out}")


if __name__ == "__main__":
    main()
