#!/bin/bash
# Queue 9: final full chip smoke (incl. reads-topk case).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
while ! grep -q "DONE-QUEUE8" /tmp/r5_queue8.log 2>/dev/null; do sleep 30; done
python scripts/chip_smoke.py
echo DONE-QUEUE9
