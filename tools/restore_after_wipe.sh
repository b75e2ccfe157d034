#!/bin/bash
# Recovery runbook after a VM wipe (this repo has survived FOUR of them:
# Aug 18-20 2026). Gitignored artifacts are volatile: every orbax tree
# under model-repo/ and the .jax_cache/ compilation cache vanish; only
# the curated pointer JSONs survive in git.
#
# Usage:  tools/restore_after_wipe.sh [--budget-hours N]
#
# Picks the retrain plan that fits the time budget and relaunches it
# DETACHED (setsid nohup), then tells you what to run afterwards.
#
#   budget >= 4h : full chain (tools/train_chain_round5c.sh)
#                  v2 5000 steps -> stream warm-start 3000 -> CTC 1500;
#                  pointers restored from git (same recipe + seed =>
#                  reproduces the curated evals, verified Aug 19).
#   budget >= 1h : flagship only, SHORT schedule (1200 steps, the
#                  round-5d fallback). The trainer writes an HONEST
#                  pointer from its own held-out eval — do NOT restore
#                  the curated 5000-step pointer over it.
#   budget <  1h : nothing trainable; bench will stamp
#                  "random+blank-bias" and that is the truth.
#
# After ANY retrain finishes:
#   python bench.py          # re-warm .jax_cache for the driver capture
# and make NO further edits to bench-trace-stack files (bench.py,
# runtime/pipeline.py, ops/pallas/{decode_loop,beam_loop,mel_kernel}.py,
# runtime/lane_engine.py) or the warmed cache keys rotate.
set -u
cd "$(dirname "$0")/.." || exit 1

BUDGET="${2:-4}"
[ "${1:-}" = "--budget-hours" ] || BUDGET=4

if [ -d model-repo/large-synth-v2 ] && [ -f model-repo/large-synth-v2/_METADATA ]; then
    echo "model-repo/large-synth-v2 already exists; nothing to do."
    echo "(ls model-repo/ to check the other trees; .jax_cache may still be cold)"
    exit 0
fi

if [ "$(echo "$BUDGET >= 4" | bc)" = 1 ]; then
    echo "launching FULL chain (~3.5h): tools/train_chain_round5c.sh"
    setsid nohup bash tools/train_chain_round5c.sh > /tmp/chain.out 2>&1 &
    echo "log: /tmp/chain_r5c.log ; then run: python bench.py"
elif [ "$(echo "$BUDGET >= 1" | bc)" = 1 ]; then
    echo "launching SHORT flagship retrain (~50 min incl. compile)"
    setsid nohup timeout 3300 python tools/train_synth.py --preset large \
        --steps 1200 --mix-long 0.5 --remat --batch 16 --lr 0.0002 --seed 0 \
        --ckpt-out model-repo/large-synth-v2 --save-every 200 \
        > /tmp/train_v2_short.log 2>&1 &
    echo "log: /tmp/train_v2_short.log ; commit the new pointer JSON"
    echo "(it has the honest short-schedule eval), then: python bench.py"
else
    echo "budget < 1h: skip training; bench stamps random+blank-bias."
fi
