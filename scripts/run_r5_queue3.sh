#!/bin/bash
# Queue 3: classic topk A/B retry with buffer-refresh hardening.
# Waits on queue 2's sentinel LINE (not pgrep — launcher-cmdline trap).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
while ! grep -q "DONE-QUEUE2" /tmp/r5_queue2.log 2>/dev/null; do sleep 30; done
python scripts/exp_bk_r5.py classic $((1<<22)) 4 16
echo DONE-QUEUE3
