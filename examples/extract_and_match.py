"""End-to-end example: the reference's Example.cpp, TPU edition.

Reads two NIfTI volumes (generating a synthetic Torus pair if none given),
extracts 3D SIFT keypoints from both, enhanced-matches at threshold 0.85 and
prints the matched coordinate pairs — the exact output contract of
Example.cpp:46-56.

Usage:
    python examples/extract_and_match.py [ref.nii.gz tar.nii.gz] [--threshold 0.85]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("volumes", nargs="*", help="ref and tar NIfTI paths")
    ap.add_argument("--threshold", type=float, default=0.85)
    ap.add_argument("--mode", choices=["inject", "biject", "enhanced"],
                    default="enhanced")
    args = ap.parse_args()

    from sift3d_tpu import (
        SIFT3D, SiftConfig, biject_match, enhanced_match, inject_match,
    )
    from sift3d_tpu.io.native import read_nii
    from sift3d_tpu.io.nifti import write_nii
    from sift3d_tpu.oracle import fixtures

    if len(args.volumes) == 2:
        ref_path, tar_path = args.volumes
    else:
        d = Path(tempfile.mkdtemp(prefix="sift3d_example_"))
        ref_path = d / "Torus_Ref.nii.gz"
        tar_path = d / "Torus_Def.nii.gz"
        base = fixtures.torus_volume((96, 96, 96), noise=0.02)
        write_nii(ref_path, fixtures.warped_volume(base, (0.31, 0.17, 0.23)))
        write_nii(tar_path, fixtures.warped_volume(base, (1.5, -2.0, 1.0)))
        print(f"(no volumes given; synthetic torus pair in {d})", file=sys.stderr)

    ref = read_nii(ref_path)
    tar = read_nii(tar_path)
    print(f"Dimensions of reference image: {ref.shape[2]} {ref.shape[1]} {ref.shape[0]}")
    print(f"Dimensions of target image: {tar.shape[2]} {tar.shape[1]} {tar.shape[0]}")

    sift = SIFT3D(SiftConfig())
    ref_kps = sift.extract(ref)
    tar_kps = sift.extract(tar)
    print(f"Reference keypoints: {int(ref_kps.num_valid)}")
    print(f"Target keypoints: {int(tar_kps.num_valid)}")

    matcher = {"inject": inject_match, "biject": biject_match,
               "enhanced": enhanced_match}[args.mode]
    rc, tc, valid = matcher(ref_kps, tar_kps, args.threshold)
    rc = np.asarray(rc)[np.asarray(valid)]
    tc = np.asarray(tc)[np.asarray(valid)]

    print("Matched Points: reference coordinate(x,y,z);target coordinate(x,y,z)")
    for a, b in zip(rc, tc):
        print(f"{a[0]:g},{a[1]:g},{a[2]:g};{b[0]:g},{b[1]:g},{b[2]:g}")


if __name__ == "__main__":
    main()
