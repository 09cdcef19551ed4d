#!/bin/bash
# r5 FIG7 refresh: all six AC058 Fig.7 expressions at the r4 geometry
# (adds B=1024, mul rows B=256 with the A*B*C chunked-2x128 config).
set -x
cd "$(dirname "$0")/.."
mkdir -p artifacts/r5

for e in add_add add_sub sub_sub; do
  EB_PARAMS=ieache_110_l2 EB_BATCH=1024 EB_WIDTH=16 EB_EXPR=$e \
    timeout 3600 python tools/expr_bench.py \
    > artifacts/r5/fig7_$e.json 2>&1
  echo "=== $e rc=$?"
done
for e in mul_add add_mul; do
  EB_PARAMS=ieache_110_l2 EB_BATCH=256 EB_WIDTH=16 EB_EXPR=$e \
    timeout 3600 python tools/expr_bench.py \
    > artifacts/r5/fig7_$e.json 2>&1
  echo "=== $e rc=$?"
done
EB_PARAMS=ieache_110_l2 EB_BATCH=256 EB_WIDTH=16 EB_EXPR=mul_mul \
  EB_CHUNK=128 timeout 3600 python tools/expr_bench.py \
  > artifacts/r5/fig7_mul_mul.json 2>&1
echo "=== mul_mul rc=$?"
echo "=== r5_fig7 ALL DONE"
