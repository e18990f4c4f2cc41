#!/bin/bash
cd /root/repo
echo "=== R: defaults probe (incl. wx-mask fold) ==="
python bench.py --no-verify --probe-compute 2>&1
echo "=== S: defaults full bench + verify ==="
python bench.py 2>&1
echo "=== MATRIX5 DONE ==="
