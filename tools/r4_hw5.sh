#!/bin/bash
cd /root/repo
set -x
WB_CASES=mul32,mul128 python tools/width_bench.py > artifacts/r4/width.log 2>&1
EB_EXPR=mul_mul EB_BATCH=256 EB_PARAMS=ieache_110_l2 python tools/expr_bench.py > artifacts/r4/fig7_mulmul_b256.log 2>&1
EB_EXPR=mul_mul EB_BATCH=1024 EB_PARAMS=ieache_110_l2 python tools/expr_bench.py > artifacts/r4/fig7_mulmul_b1024.log 2>&1
EB_EXPR=mul_add EB_BATCH=1024 EB_PARAMS=ieache_110_l2 python tools/expr_bench.py > artifacts/r4/fig7_muladd_b1024.log 2>&1
PP_BATCH=256 python tools/pallas_probe.py > artifacts/r4/probe_after_bb.log 2>&1
echo DONE_ALL
