#!/bin/bash
# r5 sweep 2: affine layout/unroll on top of dense walk + patch fold
cd /root/repo
run() { echo "=== $1 ==="; shift; env "$@" python bench.py --no-verify --probe-compute 2>&1; }
run "G: defaults (dense+fold+transposed affine)"
run "I: transposed OFF (isolate)" HESAFF_AFFINE_T=0
run "H: +unroll4" HESAFF_AFFINE_UNROLL=4
run "H2: +unroll2" HESAFF_AFFINE_UNROLL=2
echo "=== J: defaults full bench + verify ==="
python bench.py 2>&1
echo "=== MATRIX2 DONE ==="
