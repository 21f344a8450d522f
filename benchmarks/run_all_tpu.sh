#!/bin/sh
# One-shot TPU evidence suite: run when the axon tunnel is up.
# Produces/refreshes: bench 256/512 logs, matcher scale + precision,
# stage profile, ROOFLINE.json. Kernel knob A/Bs are run separately via
# benchmarks/ab_knobs.py (parity-gated; logs land in /tmp/ab_*.log).
# Collect everything with benchmarks/collect_evidence.py -> EVIDENCE_r3.json.
set -x
cd "$(dirname "$0")/.."

timeout 3000 python bench.py --size 256 --runs 4 > /tmp/ev_bench256.log 2>&1
timeout 1200 python benchmarks/profile_stages.py --size 256 > /tmp/ev_stages.log 2>&1
timeout 1800 python benchmarks/roofline.py --size 256 > /tmp/ev_roofline.log 2>&1
timeout 1200 python benchmarks/desc_vpu.py > /tmp/ev_descvpu.log 2>&1
timeout 3000 python benchmarks/match_scale.py --n 50000 --m 50000 > /tmp/ev_match50k.log 2>&1
timeout 1500 python benchmarks/match_precision.py --n 20000 --m 20000 > /tmp/ev_matchprec.log 2>&1
timeout 4800 python bench.py --size 512 --runs 2 > /tmp/ev_bench512.log 2>&1
echo done
