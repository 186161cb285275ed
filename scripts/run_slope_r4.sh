#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
for m in hash fused bk fp compare walk; do
  echo "=== $m $(date +%H:%M:%S) ==="
  timeout 2400 python scripts/exp_slope_r4.py "$m" 4194304 4 16 2>&1 |
    grep -vE "^\[2m|E0000|WARNING|Source|libtpu"
done
echo "=== DONE $(date +%H:%M:%S) ==="
