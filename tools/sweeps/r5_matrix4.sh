#!/bin/bash
# r5 sweep 4: block-size knobs at the new operating point + batch 32
cd /root/repo
run() { echo "=== $1 ==="; shift; env "$@" python bench.py --no-verify --probe-compute ${EXTRA:-} 2>&1; }
run "N: defaults (80.3k reference row)"
run "O: PATCH_KB=16" HESAFF_PATCH_KB=16
run "P: AFFINE_KB=16" HESAFF_AFFINE_KB=16
echo "=== Q: batch 32 ==="
python bench.py --no-verify --probe-compute --batch 32 2>&1
echo "=== MATRIX4 DONE ==="
