#!/bin/bash
# Queue 5: classic topk A/B, sequential per-executable timing.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
while ! grep -q "DONE-QUEUE4" /tmp/r5_queue4.log 2>/dev/null; do sleep 30; done
python scripts/exp_bk_r5.py classic $((1<<22)) 4 16
echo DONE-QUEUE5
