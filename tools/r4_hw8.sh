#!/bin/bash
cd /root/repo
set -x
ST_MODES=split,tr ST_STEPS=500 ST_B=4096 python tools/step_bench.py > artifacts/r4/sb_tr_b4096.log 2>&1
echo DONE_ALL
