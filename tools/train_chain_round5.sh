#!/bin/bash
# Round-5 training chain, run detached (setsid nohup) so it survives
# builder-session restarts. Serializes the two chip-bound trainings:
#   1. flagship retrain  -> model-repo/large-synth-v2  (trees are wiped
#      on every VM re-create; the curated pointer JSON lives in git and
#      is restored after training overwrites it)
#   2. causal/streaming  -> model-repo/large-synth-stream (bench.py and
#      the native loadtest auto-load this path)
# then writes the "streaming train done" marker that
# tools/capture_round5.sh waits on before the artifact capture queue.
set -u
cd /root/repo || exit 1
LOG=/tmp/chain_stream.log
mark() { echo "=== $1 $(date -u +%H:%M:%S) ===" >> "$LOG"; }
: > "$LOG"

mark "v2 train start"
timeout 18000 python tools/train_synth.py --preset large --steps 5000 \
    --mix-long 0.5 --remat --batch 16 --lr 0.0002 --seed 0 \
    --ckpt-out model-repo/large-synth-v2 --save-every 500 \
    > /tmp/train_v2.log 2>&1
mark "v2 train rc=$?"
# training overwrites the curated pointer; git has the adjudicated one
git checkout -- model-repo/large-synth-v2.json 2>> "$LOG"

mark "stream train start"
timeout 18000 python tools/train_synth.py --preset large-streaming \
    --steps 5000 --mix-long 0.5 --remat --batch 16 --lr 0.0002 --seed 0 \
    --ckpt-out model-repo/large-synth-stream --save-every 500 \
    > /tmp/train_stream.log 2>&1
mark "stream train rc=$?"

mark "streaming train done"
