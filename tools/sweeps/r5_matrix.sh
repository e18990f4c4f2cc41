#!/bin/bash
# r5 clean A/B matrix: dense walk x packed affine x patch fold
cd /root/repo
run() { echo "=== $1 ==="; shift; env "$@" python bench.py --no-verify --probe-compute 2>&1; }
run "A: all off (r4 baseline config)" HESAFF_DETECT_DENSE=0 HESAFF_AFFINE_PACKED=0 HESAFF_PATCH_FOLD=0
run "B: +dense walk" HESAFF_DETECT_DENSE=1 HESAFF_AFFINE_PACKED=0 HESAFF_PATCH_FOLD=0
run "C: +packed affine" HESAFF_DETECT_DENSE=0 HESAFF_AFFINE_PACKED=1 HESAFF_PATCH_FOLD=0
run "D: +patch fold" HESAFF_DETECT_DENSE=0 HESAFF_AFFINE_PACKED=0 HESAFF_PATCH_FOLD=1
run "E: all on (defaults)" HESAFF_DETECT_DENSE=1 HESAFF_AFFINE_PACKED=1 HESAFF_PATCH_FOLD=1
echo "=== F: defaults full bench + verify ==="
python bench.py 2>&1
echo "=== MATRIX DONE ==="
