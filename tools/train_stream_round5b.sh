#!/bin/bash
# Round-5b: streaming (causal) train, WARM-STARTED from the trained
# non-causal flagship (model-repo/large-synth-v2).
#
# Why: the from-scratch large-streaming run pinned at the uniform-token
# saddle (loss ~= ln(1030) = 6.94 for 1000+ steps) even WITH
# layerscale=0.1 — the causal variant (left-only convs + (128,0)
# attention) is harder to escape than the bidirectional stack, which
# breaks out in <600 steps. Warm-starting from v2 sidesteps the saddle
# entirely: the param trees are identical (causal only changes
# padding/masking), and v2's LayerScale gains are already opened up.
#
# On success this appends the "streaming train done" marker that
# tools/capture_round5.sh waits on.
set -u
cd /root/repo || exit 1
LOG=/tmp/chain_stream.log
mark() { echo "=== $1 $(date -u +%H:%M:%S) ===" >> "$LOG"; }

mark "stream train (warm-start v2) start"
timeout 14400 python tools/train_synth.py --preset large-streaming \
    --steps 3000 --mix-long 0.5 --remat --batch 16 \
    --lr 0.0001 --warmup 100 --seed 0 \
    --ckpt-in model-repo/large-synth-v2 \
    --ckpt-out model-repo/large-synth-stream --save-every 500 \
    > /tmp/train_stream.log 2>&1
mark "stream train rc=$?"

mark "streaming train done"
