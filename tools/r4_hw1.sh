#!/bin/bash
# r4 hardware pass 1: validate the bitcast ext-product kernel on device,
# then A/B the step cost vs the r3 arith kernel.
cd /root/repo
set -x
PP_BATCH=256 python tools/pallas_probe.py > artifacts/r4/probe_bc.log 2>&1
SB_MODES=split SB_STEPS=500 SB_B=1024 IEACHE_EXT_IMPL=arith python tools/step_bench.py > artifacts/r4/sb_arith.log 2>&1
SB_MODES=split SB_STEPS=500 SB_B=1024 IEACHE_EXT_IMPL=bc IEACHE_EXT_FOLD=1 python tools/step_bench.py > artifacts/r4/sb_bc_f1.log 2>&1
SB_MODES=split SB_STEPS=500 SB_B=1024 IEACHE_EXT_IMPL=bc IEACHE_EXT_FOLD=4 python tools/step_bench.py > artifacts/r4/sb_bc_f4.log 2>&1
SB_MODES=split SB_STEPS=500 SB_B=1024 IEACHE_EXT_IMPL=bc IEACHE_EXT_FOLD=1 IEACHE_EXT_CHUNK=512 python tools/step_bench.py > artifacts/r4/sb_bc_f1_c512.log 2>&1
echo DONE_ALL
