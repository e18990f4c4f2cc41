#!/bin/bash
# r5 A/B: sublane-packed affine loop vs unpacked, on hardware
cd /root/repo
echo "=== packed (default) full bench + verify ==="
python bench.py 2>&1
echo "=== packed probe-compute ==="
python bench.py --no-verify --probe-compute 2>&1
echo "=== unpacked probe-compute ==="
HESAFF_AFFINE_PACKED=0 python bench.py --no-verify --probe-compute 2>&1
echo "=== unpacked full ==="
HESAFF_AFFINE_PACKED=0 python bench.py --no-verify 2>&1
echo "=== DONE ==="
