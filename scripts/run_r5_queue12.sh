#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
python scripts/exp_bk_r5.py topk_kernel:rot $((1<<22)) 4 16
echo DONE-QUEUE12
