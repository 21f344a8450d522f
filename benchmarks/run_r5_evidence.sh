#!/bin/sh
# Round-5 one-shot TPU evidence suite (serialized; run alone on the host).
# Quick/high-value artifacts first in case the axon tunnel drops mid-run:
# ROOFLINE descriptor-VPU row, DMA re-probe, 256^3 bench, biject-50k sweep,
# 768^3 streaming extract, 512^3 bench, profile/roofline, the round-5
# parity-gated A/Bs, then collect everything into EVIDENCE_r5.json.
set -x
cd "$(dirname "$0")/.."

timeout 1200 python benchmarks/desc_vpu.py > /tmp/ev_descvpu.log 2>&1
timeout 600  python benchmarks/dma_probe.py --out DMA_PROBE_r05.json > /tmp/ev_dmaprobe.log 2>&1
timeout 1200 python tools/detect_unaligned_tpu.py > /tmp/ev_detectunaligned.log 2>&1
timeout 3000 python bench.py --size 256 --runs 4 > /tmp/ev_bench256.log 2>&1
timeout 3000 python benchmarks/match_scale.py --n 50000 --m 50000 > /tmp/ev_match50k.log 2>&1
timeout 3600 python benchmarks/extract_768.py > /tmp/ev_extract768.log 2>&1
timeout 4800 python bench.py --size 512 --runs 2 > /tmp/ev_bench512.log 2>&1
timeout 1200 python benchmarks/profile_stages.py --size 256 > /tmp/ev_stages.log 2>&1
timeout 1800 python benchmarks/roofline.py --size 256 > /tmp/ev_roofline.log 2>&1
timeout 1500 python benchmarks/match_precision.py --n 20000 --m 20000 > /tmp/ev_matchprec.log 2>&1
# round-5 A/Bs, regenerated fresh (old /tmp logs do not survive reboots):
# baseline = round-4 defaults (argmax face select, dense kernel)
SIFT3D_FACE_SELECT=ndot SIFT3D_DESC_SPHERE=0 \
  timeout 2400 python benchmarks/ab_knobs.py --record /tmp/ab_base_r5.npz > /tmp/ab_base_r5.log 2>&1
SIFT3D_FACE_SELECT=sym SIFT3D_DESC_SPHERE=0 \
  timeout 2400 python benchmarks/ab_knobs.py --vs /tmp/ab_base_r5.npz > /tmp/ab_facesym.log 2>&1
SIFT3D_FACE_SELECT=sym SIFT3D_DESC_SPHERE=1 \
  timeout 2400 python benchmarks/ab_knobs.py --vs /tmp/ab_base_r5.npz > /tmp/ab_descsparse.log 2>&1
python benchmarks/collect_evidence.py
python benchmarks/multihost_model.py
python benchmarks/collect_evidence.py
echo done
