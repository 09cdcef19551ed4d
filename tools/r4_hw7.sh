#!/bin/bash
cd /root/repo
set -x
EB_EXPR=add_add EB_BATCH=1024 EB_PARAMS=ieache_110_l2 python tools/expr_bench.py > artifacts/r4/fig7_addadd_b1024.log 2>&1
EB_EXPR=add_sub EB_BATCH=1024 EB_PARAMS=ieache_110_l2 python tools/expr_bench.py > artifacts/r4/fig7_addsub_b1024.log 2>&1
EB_EXPR=sub_sub EB_BATCH=1024 EB_PARAMS=ieache_110_l2 python tools/expr_bench.py > artifacts/r4/fig7_subsub_b1024.log 2>&1
python bench.py > artifacts/r4/bench_final.log 2>&1
PP_BATCH=256 python tools/pallas_probe.py > artifacts/r4/probe_final.log 2>&1
echo DONE_ALL
