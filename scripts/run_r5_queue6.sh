#!/bin/bash
# Queue 6: classic masked vs topk, one variant per process (relay-safe),
# then the full bench with the nonzero-free selection tails.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
python scripts/exp_bk_r5.py classic_one:masked $((1<<22)) 4 16
python scripts/exp_bk_r5.py classic_one:topk $((1<<22)) 4 16
python bench.py
echo DONE-QUEUE6
