#!/bin/bash
# r5 sweep 7: lane-layout gradients + double-width selection matmul A/B
cd /root/repo
run() { echo "=== $1 ==="; shift; env "$@" python bench.py --no-verify --probe-compute 2>&1; }
run "LGX: lane-grad + xcat" HESAFF_AFFINE_LANE_GRAD=1 HESAFF_AFFINE_XCAT=1
run "LG: lane-grad only" HESAFF_AFFINE_LANE_GRAD=1
echo "=== MATRIX7 FULLY DONE ==="
