#!/bin/bash
# Queue 4: production-layout cohort A/B, full chip smoke, bench preview.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
while ! grep -q "DONE-QUEUE3" /tmp/r5_queue3.log 2>/dev/null; do sleep 30; done
python scripts/exp_fp_cohort_r5.py $((1<<19)) 2 8 random,shifts
python scripts/chip_smoke.py
python bench.py
echo DONE-QUEUE4
