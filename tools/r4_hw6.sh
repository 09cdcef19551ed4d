#!/bin/bash
cd /root/repo
set -x
EB_EXPR=mul_add EB_BATCH=256 EB_PARAMS=ieache_110_l2 python tools/expr_bench.py > artifacts/r4/fig7_muladd_b256.log 2>&1
EB_EXPR=add_mul EB_BATCH=256 EB_PARAMS=ieache_110_l2 python tools/expr_bench.py > artifacts/r4/fig7_addmul_b256.log 2>&1
EB_EXPR=mul_mul EB_BATCH=128 EB_PARAMS=ieache_110_l2 python tools/expr_bench.py > artifacts/r4/fig7_mulmul_b128.log 2>&1
EB_EXPR=mul_mul EB_BATCH=256 EB_CHUNK=128 EB_PARAMS=ieache_110_l2 python tools/expr_bench.py > artifacts/r4/fig7_mulmul_b256_c128.log 2>&1
ST_MODES=split ST_STEPS=500 ST_B=8 python tools/step_bench.py > artifacts/r4/sb_b8_auto.log 2>&1
ST_MODES=split ST_STEPS=500 ST_B=8 IEACHE_EXT_CHUNK=256 python tools/step_bench.py > artifacts/r4/sb_b8_c256.log 2>&1
EB_EXPR=add_sub EB_BATCH=8 EB_ADDER=kogge_stone EB_PARAMS=ieache_110_l2 python tools/expr_bench.py > artifacts/r4/expr8_ks.log 2>&1
EB_EXPR=add_sub EB_BATCH=8 EB_PARAMS=ieache_110_l2 python tools/expr_bench.py > artifacts/r4/expr8_ripple.log 2>&1
python tools/transposed_probe.py > artifacts/r4/transposed_probe.log 2>&1
echo DONE_ALL
