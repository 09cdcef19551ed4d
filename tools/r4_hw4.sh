#!/bin/bash
# r4 hardware pass 4: noise margin after the windowed-CSA change,
# shape-class width bench after the plane kernel, A*B*C at B>=256
# (streaming-CSA target), and fresh headline benches.
cd /root/repo
set -x
python tools/margin_probe.py > artifacts/r4/margin.log 2>&1
WB_CASES=mul32,mul128 python tools/width_bench.py > artifacts/r4/width.log 2>&1
EB_EXPR=mul_mul EB_BATCH=256 EB_PARAMS=ieache_110_l2 python tools/expr_bench.py > artifacts/r4/fig7_mulmul_b256.log 2>&1
EB_EXPR=mul_mul EB_BATCH=1024 EB_PARAMS=ieache_110_l2 python tools/expr_bench.py > artifacts/r4/fig7_mulmul_b1024.log 2>&1
python bench.py > artifacts/r4/bench_b1024.log 2>&1
BENCH_BATCH=4096 python bench.py > artifacts/r4/bench_b4096.log 2>&1
echo DONE_ALL
