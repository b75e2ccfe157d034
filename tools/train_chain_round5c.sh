#!/bin/bash
# Round-5c training chain: rebuild ALL trained checkpoint trees after the
# THIRD VM wipe (Aug 20 ~01:47 UTC — every gitignored orbax tree plus
# .jax_cache/ gone again; only the curated pointer JSONs survive in git).
# Run detached (setsid nohup) so it survives builder-session restarts.
#
# Order = serving priority for the driver's round-end bench capture:
#   1. flagship retrain       -> model-repo/large-synth-v2   (~2h)
#   2. causal/streaming       -> model-repo/large-synth-stream (~1h;
#      WARM-START from v2 — from-scratch saddle-pins, see
#      tools/train_stream_round5b.sh and CLAUDE.md "Training findings")
#   3. CTC head               -> model-repo/large-synth-ctc  (~0.5h;
#      encoder warm-started from v2)
# After each phase the curated pointer JSON (overwritten by the trainer)
# is restored from git — the adjudicated eval numbers live there.
set -u
cd /root/repo || exit 1
LOG=/tmp/chain_r5c.log
mark() { echo "=== $1 $(date -u +%H:%M:%S) ===" >> "$LOG"; }
: > "$LOG"

mark "v2 train start"
timeout 18000 python tools/train_synth.py --preset large --steps 5000 \
    --mix-long 0.5 --remat --batch 16 --lr 0.0002 --seed 0 \
    --ckpt-out model-repo/large-synth-v2 --save-every 500 \
    > /tmp/train_v2.log 2>&1
mark "v2 train rc=$?"
git checkout -- model-repo/large-synth-v2.json 2>> "$LOG"

mark "stream train (warm-start v2) start"
timeout 14400 python tools/train_synth.py --preset large-streaming \
    --steps 3000 --mix-long 0.5 --remat --batch 16 \
    --lr 0.0001 --warmup 100 --seed 0 \
    --ckpt-in model-repo/large-synth-v2 \
    --ckpt-out model-repo/large-synth-stream --save-every 500 \
    > /tmp/train_stream.log 2>&1
mark "stream train rc=$?"
git checkout -- model-repo/large-synth-stream.json 2>> "$LOG"

mark "ctc train (encoder from v2) start"
timeout 7200 python tools/train_ctc_synth.py --preset large --steps 1500 \
    --batch 16 --lr 2e-4 --warmup 100 --mix-long 0.5 --remat \
    --encoder-from model-repo/large-synth-v2 \
    --ckpt-out model-repo/large-synth-ctc --save-every 500 \
    > /tmp/train_ctc.log 2>&1
mark "ctc train rc=$?"
git checkout -- model-repo/large-synth-ctc.json 2>> "$LOG"

mark "chain done"
