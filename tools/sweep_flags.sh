#!/bin/bash
# On-chip A/B sweep of the env-gated kernel variants (PERF.md queue).
# Each run reuses the persistent compile cache; only stages whose
# kernels change recompile. Results append to /tmp/sweep_r3.log.
cd "$(dirname "$0")/.."
LOG=${SWEEP_LOG:-/tmp/sweep_r3.log}
run() {
  name="$1"; shift
  echo "=== $name [$*] $(date +%H:%M:%S)" >> "$LOG"
  env "$@" timeout 2400 python bench.py ${BENCH_ARGS} >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run patch_classes HESAFF_PATCH_CLASSES=1
run lockstep_phases HESAFF_AFFINE_LOCKSTEP=1 HESAFF_AFFINE_PHASES=4,8
run both HESAFF_PATCH_CLASSES=1 HESAFF_AFFINE_LOCKSTEP=1 HESAFF_AFFINE_PHASES=4,8
run octave_chain HESAFF_OCTAVE_CHAIN=1
run dma_pipes HESAFF_AFFINE_DMA_PIPE=1 HESAFF_PATCH_DMA_PIPE=1
echo "=== sweep done $(date +%H:%M:%S)" >> "$LOG"
