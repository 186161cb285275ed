#!/bin/bash
# Queue 7: final bench with the cummin-free tails.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
python bench.py
echo DONE-QUEUE7
