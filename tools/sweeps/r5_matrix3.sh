#!/bin/bash
# r5 sweep 3: dynamic y-pass bound + fast mode + close-out
cd /root/repo
echo "=== K: defaults (now incl. dynamic ws bound) probe ==="
python bench.py --no-verify --probe-compute 2>&1
echo "=== L: fast mode probe ==="
python bench.py --no-verify --probe-compute --fast 2>&1
echo "=== M: defaults full bench + verify ==="
python bench.py 2>&1
echo "=== MATRIX3 DONE ==="
