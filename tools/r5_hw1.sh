#!/bin/bash
# r5 hardware batch 1: scan-kernel validation + B=8 latency (VERDICT
# r4 #1) and the tr decomposition (VERDICT r4 #4).  Sequential — one
# TPU job at a time; staged flushed prints; NEVER kill an in-flight
# compile (CLAUDE.md).
set -x
cd "$(dirname "$0")/.."
mkdir -p artifacts/r5

# 1. scan mode on-device bit-exactness (the hardware-only check class)
IEACHE_PALLAS_STEP=scan PP_BATCH=8 timeout 3600 \
  python tools/pallas_probe.py > artifacts/r5/probe_scan_b8.json 2>&1
echo "=== probe scan b8 done rc=$?"
IEACHE_PALLAS_STEP=scan PP_BATCH=256 timeout 3600 \
  python tools/pallas_probe.py > artifacts/r5/probe_scan_b256.json 2>&1
echo "=== probe scan b256 done rc=$?"

# 2. per-step cost at B=8: split (r4 floor) vs fused2 vs scan
ST_MODES=split,fused2,scan ST_B=8 ST_STEPS=500 ST_ITERS=8 timeout 3600 \
  python tools/step_bench.py > artifacts/r5/step_b8.json 2>&1
echo "=== step b8 done rc=$?"

# 3. scan at mid batches (does the scan kernel also help throughput?)
ST_MODES=split,scan ST_B=256 ST_STEPS=500 ST_ITERS=8 timeout 3600 \
  python tools/step_bench.py > artifacts/r5/step_b256.json 2>&1
echo "=== step b256 done rc=$?"
ST_MODES=split,scan ST_B=512 ST_STEPS=500 ST_ITERS=8 timeout 3600 \
  python tools/step_bench.py > artifacts/r5/step_b512.json 2>&1
echo "=== step b512 done rc=$?"

# 4. B=8 expression latency head-to-head (r4: 0.70 s warm; target 0.45)
EB_PARAMS=ieache_110_l2 EB_BATCH=8 EB_WIDTH=16 timeout 3600 \
  python tools/expr_bench.py > artifacts/r5/expr8_split.json 2>&1
echo "=== expr8 split done rc=$?"
IEACHE_PALLAS_STEP=scan EB_PARAMS=ieache_110_l2 EB_BATCH=8 EB_WIDTH=16 \
  timeout 3600 \
  python tools/expr_bench.py > artifacts/r5/expr8_scan.json 2>&1
echo "=== expr8 scan done rc=$?"

# 5. tr decomposition at the r4 geometry (B=4096, jb=256, chunk=512)
ST_MODES=split,tr,tr:probe_ident,tr:probe_nodot,tr:probe_noextract \
  ST_B=4096 ST_STEPS=500 ST_ITERS=4 timeout 7200 \
  python tools/step_bench.py > artifacts/r5/step_tr_decomp.json 2>&1
echo "=== tr decomposition done rc=$?"

echo "=== r5_hw1 ALL DONE"
