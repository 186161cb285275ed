#!/bin/bash
# Round-5 bottom-k A/B on chip: row-sort vs group-extraction compaction.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
python scripts/exp_bk_r5.py bk $((1<<22)) 4 16
python scripts/exp_bk_r5.py classic $((1<<22)) 4 16
python scripts/exp_bk_r5.py bk $((1<<24)) 2 8
echo DONE-ALL
