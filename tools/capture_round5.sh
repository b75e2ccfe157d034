#!/bin/bash
# Round-5 hardware artifact capture, run detached (setsid nohup) so the
# queue survives builder-session restarts. Waits for the training chain
# marker, then serializes every chip-bound artifact:
#   1. bench.py            — re-warms .jax_cache for the driver's
#                            round-end BENCH_r05 capture (trained weights)
#   2. wer_matrix          — WER_r05.json on the retrained flagship
#   3. wer_stream          — STREAMWER_r05.json (native serving quality)
#   4. loadtest_native     — LOADTEST_r05.json (p50/p95 partials)
#   5. bench_stream_beam   — STREAMBEAM_r05.json (carried-beam latency)
#   6. profile_encoder     — PROFILE_r05.json (per-module encoder ms)
# Nothing here edits a Pallas-stack file, so the cache warmed in (1)
# stays valid for the driver. Artifacts are committed by the builder (or
# the driver's end-of-round sweep), never by this script.
set -u
cd /root/repo || exit 1
LOG=/tmp/capture_r05.log
mark() { echo "=== $1 $(date -u +%H:%M:%S) ===" >> "$LOG"; }

mark "waiting for training chain"
while ! grep -q "streaming train done" /tmp/chain_stream.log 2>/dev/null; do
    sleep 60
done

mark "bench warm start"
timeout 10800 python bench.py > /tmp/bench_warm_r05.out 2>&1
mark "bench warm rc=$?"

mark "wer_matrix start"
timeout 10800 python tools/wer_matrix.py \
    --checkpoint model-repo/large-synth-v2 --out WER_r05.json \
    > /tmp/wer_matrix_r05.out 2>&1
mark "wer_matrix rc=$?"

mark "wer_stream start"
timeout 5400 python tools/wer_stream.py --out STREAMWER_r05.json \
    > /tmp/wer_stream_r05.out 2>&1
mark "wer_stream rc=$?"

mark "loadtest start"
timeout 5400 python tools/loadtest_native.py --streams 16 --duration 60 \
    --out LOADTEST_r05.json > /tmp/loadtest_r05.out 2>&1
mark "loadtest rc=$?"

mark "stream_beam start"
timeout 5400 python tools/bench_stream_beam.py --out STREAMBEAM_r05.json \
    > /tmp/stream_beam_r05.out 2>&1
mark "stream_beam rc=$?"

mark "profile_encoder start"
timeout 5400 python tools/profile_encoder.py --preset large \
    --checkpoint model-repo/large-synth-v2 \
    > /tmp/profile_r05.out 2>&1
mark "profile_encoder rc=$?"

mark "ALL DONE"
