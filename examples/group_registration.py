"""Groupwise rigid registration of N volumes (BASELINE config 5).

Thin driver over sift3d_tpu.parallel.group.register_group: extract 3D SIFT
keypoints per volume -> pairwise enhanced-match -> RANSAC rigid estimates
per edge -> SE(3) pose-graph Gauss-Newton refinement (optionally with the
edge-sharded psum-reduced distributed solver) -> report poses vs ground
truth.

Usage:
    python examples/group_registration.py [--n 4] [--size 64] [--sharded]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--threshold", type=float, default=0.85)
    ap.add_argument("--sharded", action="store_true",
                    help="edge-sharded pose-graph refinement over the mesh")
    args = ap.parse_args()

    import jax

    from sift3d_tpu import SiftConfig
    from sift3d_tpu.oracle import fixtures
    from sift3d_tpu.parallel import group

    rng = np.random.default_rng(0)
    base = fixtures.smooth_random_volume((args.size,) * 3, seed=0, smooth=3)
    shifts = [(0.31, 0.17, 0.23)] + [
        tuple(rng.uniform(-3, 3, 3)) for _ in range(args.n - 1)
    ]
    vols = [fixtures.warped_volume(base, s) for s in shifts]

    mesh = None
    if args.sharded:
        from sift3d_tpu.parallel import mesh as M

        mesh = M.make_mesh(len(jax.devices()))

    t0 = time.time()
    res = group.register_group(
        vols, SiftConfig(max_kp_per_level=1024),
        threshold=args.threshold, sharded_mesh=mesh,
    )
    print(f"registered {args.n} volumes in {time.time()-t0:.1f}s "
          f"(keypoints: {res.keypoint_counts})")
    for (i, j), inl in zip(res.edges, res.edge_inliers):
        print(f"  edge ({i},{j}): {inl} inliers")
    print(f"mean edge residual: {res.residual_voxels:.3f} voxels")

    print("\nrefined poses (translation vs ground-truth relative shift):")
    max_err = 0.0
    for k in range(args.n):
        t = np.asarray(res.poses.t[k])
        sk = np.array([shifts[k][2], shifts[k][1], shifts[k][0]])
        s0 = np.array([shifts[0][2], shifts[0][1], shifts[0][0]])
        gt = -(sk - s0)
        err = float(np.linalg.norm(t - gt))
        max_err = max(max_err, err)
        print(f"  vol {k}: t={t.round(3)}  gt={gt.round(3)}  err={err:.3f}")
    print(f"max pose error: {max_err:.3f} voxels")


if __name__ == "__main__":
    main()
