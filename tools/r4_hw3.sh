#!/bin/bash
# r4 hardware pass 3: decompose the ext kernel's real cost on device.
# probe_noextract = dots + recombination only (garbage tiles);
# probe_nodot    = build + extract only.  Timing-only probes.
cd /root/repo
set -x
SB_MODES=split SB_STEPS=500 SB_B=1024 IEACHE_EXT_IMPL=probe_noextract IEACHE_EXT_FOLD=1 python tools/step_bench.py > artifacts/r4/sb_probe_noextract.log 2>&1
SB_MODES=split SB_STEPS=500 SB_B=1024 IEACHE_EXT_IMPL=probe_nodot python tools/step_bench.py > artifacts/r4/sb_probe_nodot.log 2>&1
SB_MODES=split SB_STEPS=500 SB_B=1024 IEACHE_EXT_IMPL=probe_noextract IEACHE_EXT_FOLD=1 IEACHE_EXT_CHUNK=512 python tools/step_bench.py > artifacts/r4/sb_probe_noextract_c512.log 2>&1
SB_MODES=split SB_STEPS=500 SB_B=1024 IEACHE_EXT_IMPL=probe_noextract IEACHE_EXT_FOLD=4 python tools/step_bench.py > artifacts/r4/sb_probe_noextract_f4.log 2>&1
echo DONE_ALL
