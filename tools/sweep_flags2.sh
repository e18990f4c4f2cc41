#!/bin/bash
# Sweep round 2: combine round-1 winners (dma_pipes + lockstep_phases),
# block-size sweep, batch scaling, stage attribution, profile cuts.
cd "$(dirname "$0")/.."
LOG=${SWEEP_LOG:-/tmp/sweep_r3b.log}
run() {
  name="$1"; args="$2"; shift 2
  echo "=== $name [$* | $args] $(date +%H:%M:%S)" >> "$LOG"
  env "$@" timeout 2400 python bench.py $args >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
PIPE="HESAFF_AFFINE_DMA_PIPE=1 HESAFF_PATCH_DMA_PIPE=1"
LS="HESAFF_AFFINE_LOCKSTEP=1 HESAFF_AFFINE_PHASES=4,8"
run pipe_lockstep       ""           $PIPE $LS
run pipe_lockstep_kb16  ""           $PIPE $LS HESAFF_AFFINE_KB=16
run pipe_batch32        "--batch 32" $PIPE
run pipe_stages         "--stages"   $PIPE
run profile_xonly       "--stages"   $PIPE HESAFF_PATCH_PROFILE=xonly
run profile_noblur      "--stages"   $PIPE HESAFF_PATCH_PROFILE=noblur
run profile_affine_pro  "--stages"   $PIPE HESAFF_AFFINE_PROFILE=prologue
echo "=== sweep2 done $(date +%H:%M:%S)" >> "$LOG"
