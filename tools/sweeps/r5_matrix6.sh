#!/bin/bash
# r5 sweep 6: fused walk + selection-blend + mask-fold close-out
cd /root/repo
run() { echo "=== $1 ==="; shift; env "$@" python bench.py --no-verify --probe-compute 2>&1; }
run "R2: defaults probe (fused walk + selection blend + mask fold)"
run "T: PATCH_ROWS=8" HESAFF_PATCH_ROWS=8
run "O2: PATCH_KB=16" HESAFF_PATCH_KB=16
run "X: fused walk OFF (isolate)" HESAFF_DETECT_FUSED_WALK=0
echo "=== U: defaults full bench + verify ==="
python bench.py 2>&1
echo ""
echo "=== V: batch 32 probe ==="
python bench.py --no-verify --probe-compute --batch 32 2>&1
echo "=== W: fast-mode probe (close-out) ==="
python bench.py --no-verify --probe-compute --fast 2>&1
echo "=== MATRIX6 FULLY DONE ==="
