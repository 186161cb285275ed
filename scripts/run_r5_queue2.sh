#!/bin/bash
# Queue 2: re-run bk/classic A/B with the column-oriented extraction,
# then the interleaved fingerprint cohort A/B.  Waits for queue 1.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
while pgrep -f "run_bk_r5.sh" > /dev/null; do sleep 30; done
python scripts/exp_bk_r5.py bk $((1<<22)) 4 16
python scripts/exp_bk_r5.py classic $((1<<22)) 4 16
python scripts/exp_bk_r5.py bk $((1<<24)) 2 8
python scripts/exp_fp_cohort_r5.py
echo DONE-QUEUE2
