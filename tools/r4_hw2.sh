#!/bin/bash
# r4 hardware pass 2: plane-impl ext kernel (once-per-program limb
# extraction + sliding tile window + per-chunk fold).
cd /root/repo
set -x
PP_BATCH=256 python tools/pallas_probe.py > artifacts/r4/probe_plane.log 2>&1
SB_MODES=split SB_STEPS=500 SB_B=1024 IEACHE_EXT_IMPL=plane IEACHE_EXT_FOLD=1 python tools/step_bench.py > artifacts/r4/sb_plane_f1.log 2>&1
SB_MODES=split SB_STEPS=500 SB_B=1024 IEACHE_EXT_IMPL=plane IEACHE_EXT_FOLD=4 python tools/step_bench.py > artifacts/r4/sb_plane_f4.log 2>&1
SB_MODES=split SB_STEPS=500 SB_B=1024 IEACHE_EXT_IMPL=arith IEACHE_EXT_FOLD=1 python tools/step_bench.py > artifacts/r4/sb_arith_slide_f1.log 2>&1
SB_MODES=split SB_STEPS=500 SB_B=1024 IEACHE_EXT_IMPL=plane IEACHE_EXT_FOLD=1 IEACHE_EXT_CHUNK=512 python tools/step_bench.py > artifacts/r4/sb_plane_f1_c512.log 2>&1
echo DONE_ALL
