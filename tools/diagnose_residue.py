"""Diagnose the 256^3 ground-truth residue (VERDICT r3 missing #1 / next #3).

At 256^3 the reference binary finds 2 detections (and 1 downstream keypoint)
that the TPU pipeline does not (EVIDENCE_r3 parity_vs_reference_256:
detections 18970/18972). This tool measures WHY, per missing/extra voxel:

- the reference's DoG value at the voxel and its 8 comparison neighbours
  (IsExtrema_neighbor set, Src/cSIFT3D.cc:884-911) vs ours,
- the per-level threshold peak_thresh * max|DoG| (Src/cSIFT3D.cc:384-385)
  in both builds,
- the margin by which each strict inequality holds/fails in each build.

Usage:
    python tools/diagnose_residue.py --workdir /tmp/refparity_256 \
        [--size 256] [--seed 3] [--tag ref] [--out RESIDUE_256.json]

The workdir must hold a completed reference run with --pyramids dumps
(tools/reference_parity.py --workdir ... or the ref_driver directly).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from reference_parity import read_detections_bin, read_keypoints_bin, read_volume_bin


def neighbour_values(dog_prev, dog_cur, dog_next, z, y, x):
    """The 8 comparison values of IsExtrema_neighbor
    (Src/cSIFT3D.cc:884-911): 6 face neighbours in-level plus the centre
    voxel of the previous/next DoG level."""
    return {
        "prev_center": float(dog_prev[z, y, x]),
        "x-1": float(dog_cur[z, y, x - 1]),
        "x+1": float(dog_cur[z, y, x + 1]),
        "y+1": float(dog_cur[z, y + 1, x]),
        "y-1": float(dog_cur[z, y - 1, x]),
        "z+1": float(dog_cur[z + 1, y, x]),
        "z-1": float(dog_cur[z - 1, y, x]),
        "next_center": float(dog_next[z, y, x]),
    }


def classify(val, thres, neigh):
    """Re-run the reference's acceptance logic and report margins."""
    passed = abs(val) > thres
    vals = np.array(list(neigh.values()), np.float32)
    is_min = bool(np.all(val < vals))
    is_max = bool(np.all(val > vals))
    return {
        "value": float(val),
        "threshold": float(thres),
        "thres_margin": float(abs(val) - thres),
        "passed_threshold": bool(passed),
        "is_min": is_min,
        "is_max": is_max,
        "extremum_margin": float(
            np.min(vals - val) if val <= vals.min() else np.min(val - vals)
            if val >= vals.max() else
            -min(np.min(np.abs(val - vals)), np.inf)
        ),
        "closest_neighbour_gap": float(np.min(np.abs(vals - val))),
        "neighbours": neigh,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--tag", default="ref")
    ap.add_argument("--out", default=str(REPO / "RESIDUE_256.json"))
    args = ap.parse_args()

    wd = Path(args.workdir)
    from sift3d_tpu.config import SiftConfig
    from sift3d_tpu.oracle import fixtures
    from sift3d_tpu.utils import dump as D

    shape = (args.size,) * 3
    vol = fixtures.smooth_random_volume(shape, seed=args.seed, smooth=2)
    cfg = SiftConfig().resolve_caps(shape)

    ref_dets = read_detections_bin(wd / f"detections_{args.tag}.bin")
    ref_kps = read_keypoints_bin(wd / f"keypoints_{args.tag}.bin")
    ref_kp_keys = {
        (k["octave"], k["level"], int(k["z"]), int(k["y"]), int(k["x"]))
        for k in ref_kps
    }

    print("running TPU dump...", file=sys.stderr)
    tpu = D.dump_tpu(vol, cfg)
    st = tpu["kp_status"]
    xyz = tpu["kp_xyz"]
    o_, l_ = tpu["kp_octave"], tpu["kp_level"]
    tpu_dets = {
        (int(o_[i]), int(l_[i]), int(xyz[i, 2]), int(xyz[i, 1]),
         int(xyz[i, 0]))
        for i in range(len(st)) if st[i] != 0
    }
    tpu_kps = {
        (int(o_[i]), int(l_[i]), int(xyz[i, 2]), int(xyz[i, 1]),
         int(xyz[i, 0]))
        for i in range(len(st)) if tpu["kp_valid"][i]
    }

    missing = sorted(ref_dets - tpu_dets)   # reference finds, we don't
    extra = sorted(tpu_dets - ref_dets)     # we find, reference doesn't
    kp_missing = sorted(ref_kp_keys - tpu_kps)
    kp_extra = sorted(tpu_kps - ref_kp_keys)
    print(f"missing detections: {missing}", file=sys.stderr)
    print(f"extra detections: {extra}", file=sys.stderr)
    print(f"missing kps: {kp_missing}  extra kps: {kp_extra}", file=sys.stderr)

    report = {
        "size": args.size, "tag": args.tag,
        "detections_ref": len(ref_dets), "detections_tpu": len(tpu_dets),
        "missing": [], "extra": [],
        "kp_missing": [list(map(int, k)) for k in kp_missing],
        "kp_extra": [list(map(int, k)) for k in kp_extra],
    }

    # per-level threshold in both builds, cached
    thres_cache = {}

    def thresholds(o, i):
        if (o, i) not in thres_cache:
            ref_cur = read_volume_bin(wd / f"dog_{args.tag}_o{o}_l{i}.bin")
            t_ref = np.float32(cfg.peak_thresh) * np.float32(
                np.max(np.abs(ref_cur)))
            t_tpu = np.float32(cfg.peak_thresh) * np.float32(
                np.max(np.abs(tpu[f"dog_{o}_{i}"])))
            thres_cache[(o, i)] = (float(t_ref), float(t_tpu), ref_cur)
        return thres_cache[(o, i)]

    for kind, keys in (("missing", missing), ("extra", extra)):
        for (o, i, z, y, x) in keys:
            t_ref, t_tpu, ref_cur = thresholds(o, i)
            ref_prev = read_volume_bin(wd / f"dog_{args.tag}_o{o}_l{i-1}.bin")
            ref_next = read_volume_bin(wd / f"dog_{args.tag}_o{o}_l{i+1}.bin")
            ref_n = neighbour_values(ref_prev, ref_cur, ref_next, z, y, x)
            tpu_n = neighbour_values(
                tpu[f"dog_{o}_{i-1}"], tpu[f"dog_{o}_{i}"],
                tpu[f"dog_{o}_{i+1}"], z, y, x)
            entry = {
                "key": [o, i, z, y, x],
                "ref": classify(float(ref_cur[z, y, x]), t_ref, ref_n),
                "tpu": classify(float(tpu[f"dog_{o}_{i}"][z, y, x]),
                                t_tpu, tpu_n),
                "dog_value_delta": float(
                    tpu[f"dog_{o}_{i}"][z, y, x] - ref_cur[z, y, x]),
                "threshold_delta": float(t_tpu - t_ref),
            }
            report[kind].append(entry)
            print(json.dumps(entry, indent=1), file=sys.stderr)

    Path(args.out).write_text(json.dumps(report, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
