"""Groupwise registration API (BASELINE config 5 as a library call).

register_group(volumes) runs the full pipeline: per-volume keypoint
extraction, pairwise enhanced matching over an edge set, RANSAC rigid
estimation per edge, and SE(3) pose-graph Gauss-Newton refinement —
optionally with the edge-sharded psum-reduced distributed solver.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..config import SiftConfig
from ..pipeline import SIFT3D, enhanced_match
from . import registration as R


@dataclasses.dataclass
class GroupResult:
    poses: R.Pose                     # (N,) volume->reference-frame rigid poses
    edges: list[tuple[int, int]]      # edges that produced measurements
    edge_inliers: list[int]
    keypoint_counts: list[int]
    residual_voxels: float            # mean edge residual after refinement


def default_edges(n: int) -> list[tuple[int, int]]:
    """Star around volume 0 plus a chain — connected and redundant."""
    return [(0, j) for j in range(1, n)] + [
        (i, i + 1) for i in range(1, n - 1)
    ]


def register_group(
    volumes: Sequence[np.ndarray],
    cfg: SiftConfig | None = None,
    edges: Sequence[tuple[int, int]] | None = None,
    threshold: float = 0.85,
    ransac_iters: int = 128,
    inlier_thresh: float = 1.5,
    gn_iters: int = 15,
    min_matches: int = 4,
    sharded_mesh=None,
    seed: int = 0,
) -> GroupResult:
    """Register volumes into volume 0's frame. Pose k maps volume-k
    coordinates (x, y, z original-image order) into the frame of volume 0."""
    n = len(volumes)
    cfg = cfg or SiftConfig(max_kp_per_level=2048)
    sift = SIFT3D(cfg)
    kps = [sift.extract(v) for v in volumes]

    edge_list = list(edges) if edges is not None else default_edges(n)
    ei, ej, mR, mt, inl = [], [], [], [], []
    for (i, j) in edge_list:
        rc, tc, valid = enhanced_match(kps[i], kps[j], threshold)
        v = np.asarray(valid)
        if int(v.sum()) < min_matches:
            continue
        pose, inliers = R.ransac_rigid(
            jnp.asarray(np.asarray(tc)), jnp.asarray(np.asarray(rc)),
            jnp.asarray(v), jax.random.PRNGKey(seed + i * 131 + j),
            iters=ransac_iters, inlier_thresh=inlier_thresh,
        )
        ei.append(i)
        ej.append(j)
        mR.append(np.asarray(pose.R))
        mt.append(np.asarray(pose.t))
        inl.append(int(np.asarray(inliers).sum()))

    if not ei:
        raise ValueError("no edge produced enough matches to register")

    meas = R.Pose(jnp.asarray(np.stack(mR)), jnp.asarray(np.stack(mt)))
    init = R.identity_poses(n)
    ei_a = jnp.asarray(ei)
    ej_a = jnp.asarray(ej)
    if sharded_mesh is not None:
        ndev = sharded_mesh.devices.size
        pad = (-len(ei)) % ndev
        ei_a = jnp.concatenate([ei_a, jnp.zeros(pad, ei_a.dtype)])
        ej_a = jnp.concatenate([ej_a, jnp.zeros(pad, ej_a.dtype)])
        meas = R.Pose(
            jnp.concatenate([meas.R, jnp.broadcast_to(jnp.eye(3), (pad, 3, 3))]),
            jnp.concatenate([meas.t, jnp.zeros((pad, 3))]),
        )
        poses = R.refine_pose_graph_sharded(
            init, ei_a, ej_a, meas, sharded_mesh, iters=gn_iters
        )
    else:
        poses = R.refine_pose_graph(init, ei_a, ej_a, meas, iters=gn_iters)

    # mean residual over measured edges
    res = 0.0
    for k, (i, j) in enumerate(zip(ei, ej)):
        Ti = R.Pose(poses.R[i], poses.t[i])
        Tj = R.Pose(poses.R[j], poses.t[j])
        pred = Ti.inverse().compose(Tj)
        m = R.Pose(meas.R[k], meas.t[k])
        err = m.inverse().compose(pred)
        res += float(jnp.linalg.norm(err.t))
    res /= max(len(ei), 1)

    return GroupResult(
        poses=poses,
        edges=list(zip(ei, ej)),
        edge_inliers=inl,
        keypoint_counts=[int(k.num_valid) for k in kps],
        residual_voxels=res,
    )
