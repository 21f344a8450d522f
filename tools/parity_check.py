"""Parity harness CLI: TPU pipeline vs CPU oracle, stage by stage.

The structured version of the reference's dump-everything-and-diff
verification (SURVEY.md §4). Runs both implementations on a volume (a file
or a synthetic fixture) and prints a per-stage report: GSS/DoG max
deviations, keypoint-set agreement, worst descriptor L2.

Usage:
    python tools/parity_check.py [volume.nii.gz] [--size 32] [--seed 7]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("volume", nargs="?", help="NIfTI volume path")
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--desc-tol", type=float, default=1e-3)
    args = ap.parse_args()

    from sift3d_tpu.utils import dump

    if args.volume:
        from sift3d_tpu.io.native import read_nii

        vol = read_nii(args.volume)
    else:
        from sift3d_tpu.oracle import fixtures

        vol = fixtures.smooth_random_volume(
            (args.size,) * 3, seed=args.seed, smooth=2
        )

    print(f"volume shape: {vol.shape}", file=sys.stderr)
    tpu = dump.dump_tpu(vol)
    orc = dump.dump_oracle(vol)
    report = dump.diff_dumps(tpu, orc, args.desc_tol)

    worst_level = max(report["levels"].items(), key=lambda kv: kv[1])
    print(json.dumps({
        "ok": report["ok"],
        "worst_pyramid_level": {worst_level[0]: worst_level[1]},
        "kp_tpu": report["kp_tpu"],
        "kp_oracle": report["kp_oracle"],
        "kp_common": report["kp_common"],
        "desc_l2_worst": report["desc_l2_worst"],
    }, indent=1))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
