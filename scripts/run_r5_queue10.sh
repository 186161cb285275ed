#!/bin/bash
# Queue 10: final bench after the reads-topk routing.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
while ! grep -q "DONE-QUEUE9" /tmp/r5_queue9.log 2>/dev/null; do sleep 30; done
python bench.py
echo DONE-QUEUE10
