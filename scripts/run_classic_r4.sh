#!/bin/bash
# Serial chip-experiment driver for exp_classic_r4 (one process per mode).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
for mode in kernel_only build_only bk_mask bk_rowsort bk_full mul32 add32; do
  echo "=== $mode $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/exp_classic_r4.py "$mode" 1048576 8 2>&1 |
    grep -vE "^\[2m|E0000|WARNING|Source|libtpu"
done
echo "=== DONE $(date +%H:%M:%S) ==="
