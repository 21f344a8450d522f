"""Groupwise rigid registration of N volumes (BASELINE config 5).

Pipeline: extract 3D SIFT keypoints from each volume -> pairwise
enhanced-match -> RANSAC rigid estimates per pair -> SE(3) pose-graph
Gauss-Newton refinement (edge-sharded psum reduction when a device mesh is
available) -> report per-volume poses and residuals.

Usage:
    python examples/group_registration.py [--n 4] [--size 48] [--sharded]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def synthesize_group(n, size, rng):
    """n rigidly shifted copies of a smooth random field + ground-truth
    shifts.

    Every volume (including the reference) goes through the same trilinear
    resampling so descriptors are comparable: resampling low-pass-filters
    the texture, and mixing resampled with raw volumes would break matches.
    (A torus phantom is deliberately NOT used here: ring keypoints have a
    tangent eigenvector orthogonal to the mean gradient, so the reference's
    corner filter rejects nearly all of them.)
    """
    from sift3d_tpu.oracle import fixtures

    base = fixtures.smooth_random_volume((size,) * 3, seed=0, smooth=3)
    shifts = [(0.31, 0.17, 0.23)]
    for _ in range(n - 1):
        shifts.append(tuple(rng.uniform(-3, 3, 3)))
    vols = [fixtures.warped_volume(base, s) for s in shifts]
    return vols, shifts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--threshold", type=float, default=0.85)
    ap.add_argument("--sharded", action="store_true",
                    help="edge-sharded pose-graph refinement over the mesh")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sift3d_tpu import SIFT3D, SiftConfig, enhanced_match
    from sift3d_tpu.parallel import registration as R

    rng = np.random.default_rng(0)
    vols, shifts = synthesize_group(args.n, args.size, rng)

    sift = SIFT3D(SiftConfig(max_kp_per_level=1024))
    t0 = time.time()
    kps = [sift.extract(v) for v in vols]
    jax.block_until_ready(kps)
    print(f"extracted {args.n} volumes in {time.time()-t0:.1f}s; "
          f"keypoints: {[int(k.num_valid) for k in kps]}")

    # pairwise match graph (all pairs involving volume 0 + a chain)
    edges = [(0, j) for j in range(1, args.n)] + [
        (i, i + 1) for i in range(1, args.n - 1)
    ]
    ei, ej, mR, mt = [], [], [], []
    for (i, j) in edges:
        rc, tc, valid = enhanced_match(kps[i], kps[j], args.threshold)
        v = np.asarray(valid)
        src = jnp.asarray(np.asarray(tc))   # points in volume j
        dst = jnp.asarray(np.asarray(rc))   # corresponding points in volume i
        nmatch = int(v.sum())
        if nmatch < 4:
            print(f"edge ({i},{j}): only {nmatch} matches, skipped")
            continue
        pose, inliers = R.ransac_rigid(
            src, dst, jnp.asarray(v), jax.random.PRNGKey(i * 97 + j),
            iters=128, inlier_thresh=1.5,
        )
        # T_ij maps coordinates of j into i: measurement for the pose graph
        ei.append(i)
        ej.append(j)
        mR.append(np.asarray(pose.R))
        mt.append(np.asarray(pose.t))
        print(f"edge ({i},{j}): {nmatch} matches, "
              f"{int(np.asarray(inliers).sum())} inliers, t={np.asarray(pose.t).round(2)}")

    meas = R.Pose(jnp.asarray(np.stack(mR)), jnp.asarray(np.stack(mt)))
    init = R.identity_poses(args.n)
    if args.sharded:
        from sift3d_tpu.parallel import mesh as M

        ndev = len(jax.devices())
        pad = (-len(ei)) % ndev
        ei_p = jnp.asarray(ei + [0] * pad)
        ej_p = jnp.asarray(ej + [0] * pad)
        meas = R.Pose(
            jnp.concatenate([meas.R, jnp.broadcast_to(jnp.eye(3), (pad, 3, 3))]),
            jnp.concatenate([meas.t, jnp.zeros((pad, 3))]),
        )
        poses = R.refine_pose_graph_sharded(
            init, ei_p, ej_p, meas, M.make_mesh(ndev), iters=15
        )
    else:
        poses = R.refine_pose_graph(
            init, jnp.asarray(ei), jnp.asarray(ej), meas, iters=15
        )

    print("\nrefined poses (translation vs ground-truth relative shift):")
    max_err = 0.0
    for k in range(args.n):
        # T_k maps volume-k coords into the volume-0 frame; a feature at p
        # in vol0 sits at p + (s_k - s_0) in vol k (xyz order), so
        # T_k.t ~ -(s_k - s_0).
        t = np.asarray(poses.t[k])
        sk = np.array([shifts[k][2], shifts[k][1], shifts[k][0]])
        s0 = np.array([shifts[0][2], shifts[0][1], shifts[0][0]])
        gt = -(sk - s0)
        err = float(np.linalg.norm(t - gt))
        max_err = max(max_err, err)
        print(f"  vol {k}: t={t.round(3)}  gt={gt.round(3)}  err={err:.3f}")
    print(f"max pose error: {max_err:.3f} voxels")


if __name__ == "__main__":
    main()
