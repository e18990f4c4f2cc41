#!/bin/bash
# Serialized TPU job queue for round 4: waits for the flag sweep to
# finish, then runs the retrieval bench (BASELINE config #4 at 5k),
# the fleet end-to-end bench, and a stage re-attribution — one TPU job
# at a time (single chip).
cd "$(dirname "$0")/.."
SWEEP_LOG=${SWEEP_LOG:-/tmp/sweep_r4.log}
while ! grep -q "sweep_r4 done" "$SWEEP_LOG" 2>/dev/null; do sleep 60; done

echo "=== retrieval n=5120 $(date +%H:%M:%S)" >> /tmp/r4_queue.log
timeout 6000 python tools/retrieval_bench.py --n 5120 --queries 32 \
  >> /tmp/r4_queue.log 2>&1
echo "rc=$?" >> /tmp/r4_queue.log

echo "=== fleet n=64 $(date +%H:%M:%S)" >> /tmp/r4_queue.log
timeout 6000 python tools/fleet_bench.py --n 64 --batch 8 \
  >> /tmp/r4_queue.log 2>&1
echo "rc=$?" >> /tmp/r4_queue.log

echo "=== queue done $(date +%H:%M:%S)" >> /tmp/r4_queue.log
