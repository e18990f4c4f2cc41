#!/bin/bash
# retry wrapper: poll the backend with a cheap probe; run matrix6 when alive
cd /root/repo
for i in $(seq 1 60); do
  if timeout 300 python -c "
import jax
d = jax.devices()
assert d and d[0].platform == 'tpu'
" > /dev/null 2>&1; then
    echo "backend alive at attempt $i ($(date))"
    bash tools/sweeps/r5_matrix6.sh
    exit 0
  fi
  echo "attempt $i: backend still down ($(date))"
  sleep 240
done
echo "gave up after 60 attempts"
