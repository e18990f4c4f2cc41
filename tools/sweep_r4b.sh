#!/bin/bash
# Round-4 sweep, part 2: capacity tightening + phase-A attribution.
# Waits for the r4_queue to finish (one TPU job at a time).
cd "$(dirname "$0")/.."
while ! grep -q "queue done" /tmp/r4_queue.log 2>/dev/null; do sleep 60; done
LOG=${SWEEP_LOG:-/tmp/sweep_r4b.log}
run() {
  name="$1"; args="$2"; shift 2
  echo "=== $name [$* | $args] $(date +%H:%M:%S)" >> "$LOG"
  env "$@" timeout 3000 python bench.py --no-verify $args >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run caps_tight        "--cand-div 192 --affine-div 384"
run caps_tighter      "--cand-div 256 --affine-div 512"
run cap768            "--cap 768"
echo "=== phase_a attribution $(date +%H:%M:%S)" >> "$LOG"
timeout 3000 python tools/profile_phase_a.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== sweep_r4b done $(date +%H:%M:%S)" >> "$LOG"
