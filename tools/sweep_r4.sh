#!/bin/bash
# Round-4 on-chip A/B sweep: patch/affine grid-block sizes and batch
# scaling over the current (post-deletion) defaults.  Baseline row runs
# the bare defaults explicitly so every variant diffs against it.
# Results append to $SWEEP_LOG; one TPU job at a time.
cd "$(dirname "$0")/.."
LOG=${SWEEP_LOG:-/tmp/sweep_r4.log}
run() {
  name="$1"; args="$2"; shift 2
  echo "=== $name [$* | $args] $(date +%H:%M:%S)" >> "$LOG"
  env "$@" timeout 3000 python bench.py --no-verify $args >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run baseline          ""
run patch_kb16        "" HESAFF_PATCH_KB=16
run patch_kb4         "" HESAFF_PATCH_KB=4
run affine_kb16       "" HESAFF_AFFINE_KB=16
run affine_kb4        "" HESAFF_AFFINE_KB=4
run blur_batch        "" HESAFF_PATCH_BLUR_BATCH=1
run blur_batch_kb16   "" HESAFF_PATCH_BLUR_BATCH=1 HESAFF_PATCH_KB=16
run batch24           "--batch 24"
echo "=== sweep_r4 done $(date +%H:%M:%S)" >> "$LOG"
