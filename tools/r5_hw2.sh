#!/bin/bash
# r5 hardware batch 2: scan-kernel stages (block-rule fixed) + the
# A*B*C AOT memory audit.  Sequential; never kill in-flight compiles.
set -x
cd "$(dirname "$0")/.."
mkdir -p artifacts/r5

IEACHE_PALLAS_STEP=scan PP_BATCH=8 timeout 3600 \
  python tools/pallas_probe.py > artifacts/r5/probe_scan_b8.json 2>&1
echo "=== probe scan b8 rc=$?"
IEACHE_PALLAS_STEP=scan PP_BATCH=256 timeout 3600 \
  python tools/pallas_probe.py > artifacts/r5/probe_scan_b256.json 2>&1
echo "=== probe scan b256 rc=$?"

ST_MODES=scan ST_B=8 ST_STEPS=500 ST_ITERS=8 timeout 3600 \
  python tools/step_bench.py > artifacts/r5/step_scan_b8.json 2>&1
echo "=== step scan b8 rc=$?"
ST_MODES=scan ST_B=256 ST_STEPS=500 ST_ITERS=8 timeout 3600 \
  python tools/step_bench.py > artifacts/r5/step_scan_b256.json 2>&1
echo "=== step scan b256 rc=$?"
ST_MODES=scan ST_B=512 ST_STEPS=500 ST_ITERS=8 timeout 3600 \
  python tools/step_bench.py > artifacts/r5/step_scan_b512.json 2>&1
echo "=== step scan b512 rc=$?"

IEACHE_PALLAS_STEP=scan EB_PARAMS=ieache_110_l2 EB_BATCH=8 EB_WIDTH=16 \
  timeout 3600 \
  python tools/expr_bench.py > artifacts/r5/expr8_scan.json 2>&1
echo "=== expr8 scan rc=$?"

# A*B*C AOT memory audit at the faulting and working batch sizes
# (compile only, no execution)
EB_PARAMS=ieache_110_l2 EB_BATCH=128 EB_WIDTH=32 EB_EXPR=mul_mul \
  EB_COMPILE_ONLY=1 timeout 3600 \
  python tools/expr_bench.py > artifacts/r5/mem_mulmul_b128.json 2>&1
echo "=== mem audit b128 rc=$?"
EB_PARAMS=ieache_110_l2 EB_BATCH=256 EB_WIDTH=32 EB_EXPR=mul_mul \
  EB_COMPILE_ONLY=1 timeout 3600 \
  python tools/expr_bench.py > artifacts/r5/mem_mulmul_b256.json 2>&1
echo "=== mem audit b256 rc=$?"

echo "=== r5_hw2 ALL DONE"

# tr decomposition probes (token-shape fixed; split/tr/probe_ident
# already recorded in step_tr_decomp.json)
ST_MODES=tr:probe_nodot,tr:probe_noextract ST_B=4096 ST_STEPS=500 \
  ST_ITERS=4 timeout 7200 \
  python tools/step_bench.py > artifacts/r5/step_tr_decomp2.json 2>&1
echo "=== tr decomposition2 rc=$?"
echo "=== r5_hw2b ALL DONE"
