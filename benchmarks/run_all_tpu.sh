#!/bin/sh
# One-shot TPU evidence suite: run when the axon tunnel is up.
# Produces/refreshes: BENCH log, BENCH_512, MATCH_SCALE, ROOFLINE.json,
# stage profile. Each step is independently timeout-guarded so a tunnel
# drop mid-suite doesn't wedge the run.
set -x
cd "$(dirname "$0")/.."

timeout 3000 python bench.py --size 256 --runs 4 > /tmp/ev_bench256.log 2>&1
timeout 1200 python benchmarks/profile_stages.py --size 256 > /tmp/ev_stages.log 2>&1
timeout 1800 python benchmarks/roofline.py --size 256 > /tmp/ev_roofline.log 2>&1
timeout 3000 python benchmarks/match_scale.py --n 50000 --m 50000 > /tmp/ev_match50k.log 2>&1
timeout 1500 python benchmarks/match_precision.py --n 20000 --m 20000 > /tmp/ev_matchprec.log 2>&1
timeout 4800 python bench.py --size 512 --runs 2 > /tmp/ev_bench512.log 2>&1

# kernel A/Bs (each recompiles its variant once into the persistent cache;
# keypoint/match counts must equal the main run)
SIFT3D_FACE_MXU=1 timeout 1800 python bench.py --size 256 --runs 3 --skip-cpu > /tmp/ev_ab_facemxu.log 2>&1
SIFT3D_ACCUM_GROUP=1 timeout 1800 python bench.py --size 256 --runs 3 --skip-cpu > /tmp/ev_ab_accum1.log 2>&1
SIFT3D_BLUR_PRECISION=high timeout 1800 python bench.py --size 256 --runs 3 --skip-cpu > /tmp/ev_ab_blurhigh.log 2>&1
echo done
