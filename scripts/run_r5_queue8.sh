#!/bin/bash
# Queue 8: screen distinct-count stage isolation + reads-topk A/B.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
python scripts/exp_screen_r5.py $((1<<22)) 2 8
echo DONE-QUEUE8
