#!/bin/bash
# r5 clean A/B matrix: dense packed walk x packed affine loop
cd /root/repo
echo "=== A: DENSE=0 PACKED=0 (r4 baseline config) ==="
HESAFF_DETECT_DENSE=0 HESAFF_AFFINE_PACKED=0 python bench.py --no-verify --probe-compute 2>&1
echo "=== B: DENSE=1 PACKED=0 ==="
HESAFF_DETECT_DENSE=1 HESAFF_AFFINE_PACKED=0 python bench.py --no-verify --probe-compute 2>&1
echo "=== C: DENSE=0 PACKED=1 ==="
HESAFF_DETECT_DENSE=0 HESAFF_AFFINE_PACKED=1 python bench.py --no-verify --probe-compute 2>&1
echo "=== D: DENSE=1 PACKED=1 ==="
HESAFF_DETECT_DENSE=1 HESAFF_AFFINE_PACKED=1 python bench.py --no-verify --probe-compute 2>&1
echo "=== E: defaults full bench + verify ==="
python bench.py 2>&1
echo "=== MATRIX DONE ==="
