"""Groupwise rigid/affine registration over matched keypoint sets.

Beyond the reference's scope (it stops at matched coordinate pairs); this is
the BASELINE config-5 deliverable: multi-volume group registration via a
pairwise match graph and distributed pose-graph refinement.

Design:
- pairwise transform estimation from matched coordinate pairs:
  * rigid (rotation + translation) via the Kabsch/Horn closed form (SVD of
    the cross-covariance), optionally RANSAC-robustified;
  * affine via weighted least squares;
- pose graph: node poses T_i (rigid, 6-DoF) for N volumes, edge
  measurements T_ij from pairwise registration; refined by Gauss-Newton on
  the residual r_ij = Log(T_ij^-1 * T_i^-1 * T_j), with the normal equations
  assembled per-edge and reduced across the device mesh with psum
  (the Schur-complement trick eliminates nothing here because poses are the
  only variables; the collective reduction is over edge contributions).
  Gauge freedom is fixed by anchoring pose 0.

All math is f32 JAX, fully batched over edges; the distributed path shards
edges across the mesh ("blk" axis) under shard_map with a psum reduction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import BLOCK_AXIS


# ---------------------------------------------------------------------------
# SO(3) / SE(3) helpers
# ---------------------------------------------------------------------------

def hat(w):
    """(…,3) -> (…,3,3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )


def exp_so3(w):
    """Rodrigues: (…,3) -> (…,3,3)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    K = hat(w / jnp.maximum(theta[..., 0], 1e-12))
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = eye + s * K + (1.0 - c) * (K @ K)
    return jnp.where(theta > 1e-8, R, eye + hat(w))


def log_so3(R):
    """(…,3,3) -> (…,3)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    small = theta[..., None] < 1e-6
    factor = jnp.where(
        small, 0.5 + theta[..., None] ** 2 / 12.0,
        theta[..., None] / (2.0 * jnp.sin(jnp.maximum(theta[..., None], 1e-12))),
    )
    return factor * v


class Pose(NamedTuple):
    """Rigid transform x -> R @ x + t."""

    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)

    def apply(self, x):
        return jnp.einsum("...ij,...j->...i", self.R, x) + self.t

    def compose(self, other: "Pose") -> "Pose":
        """self ∘ other: first apply `other`, then `self`."""
        return Pose(
            self.R @ other.R,
            jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t,
        )

    def inverse(self) -> "Pose":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return Pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))


def identity_poses(n: int) -> Pose:
    return Pose(jnp.broadcast_to(jnp.eye(3), (n, 3, 3)).copy(), jnp.zeros((n, 3)))


# ---------------------------------------------------------------------------
# Pairwise estimation
# ---------------------------------------------------------------------------

def estimate_rigid(src, dst, weights=None) -> Pose:
    """Weighted Kabsch/Horn: finds (R, t) minimising sum w |R src + t - dst|^2.

    src, dst: (K, 3); weights: (K,) or None.
    """
    w = jnp.ones(src.shape[0]) if weights is None else weights
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    cs = jnp.sum(src * w[:, None], 0) / wsum
    cd = jnp.sum(dst * w[:, None], 0) / wsum
    H = jnp.einsum("k,ki,kj->ij", w, src - cs, dst - cd)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.stack([1.0, 1.0, d]))
    R = Vt.T @ D @ U.T
    t = cd - R @ cs
    return Pose(R, t)


def estimate_affine(src, dst, weights=None):
    """Weighted least-squares affine A (3x4): dst ≈ A @ [src; 1]."""
    w = jnp.ones(src.shape[0]) if weights is None else weights
    X = jnp.concatenate([src, jnp.ones((src.shape[0], 1))], axis=1)  # (K, 4)
    Xw = X * w[:, None]
    lhs = X.T @ Xw  # (4, 4)
    rhs = Xw.T @ dst  # (4, 3)
    sol = jnp.linalg.solve(lhs + 1e-6 * jnp.eye(4), rhs)  # (4, 3)
    return sol.T  # (3, 4)


def ransac_rigid(
    src,
    dst,
    valid,
    key,
    iters: int = 64,
    inlier_thresh: float = 2.0,
) -> tuple[Pose, jnp.ndarray]:
    """RANSAC over minimal 3-point samples, refined on the inlier set.

    src, dst: (K, 3) fixed-capacity match arrays; valid: (K,) bool.
    Returns (pose, inlier_mask).
    """
    k = src.shape[0]
    wvalid = valid.astype(jnp.float32)
    # Sample minimal sets from the VALID lanes only, without replacement:
    # match arrays are fixed-capacity buckets that are mostly invalid lanes,
    # so uniform sampling over all k lanes almost never drew 3 valid points
    # (e.g. 10 valid in a 128 bucket -> 0.05% per trial) and RANSAC
    # degenerated to the garbage refit of a garbage best trial.
    p = wvalid / jnp.maximum(jnp.sum(wvalid), 1.0)

    def trial(key):
        idx = jax.random.choice(key, k, (3,), replace=False, p=p)
        w = jnp.zeros(k).at[idx].add(1.0) * wvalid
        pose = estimate_rigid(src, dst, w + 1e-9)
        err = jnp.linalg.norm(pose.apply(src) - dst, axis=-1)
        inl = (err < inlier_thresh) & valid
        return jnp.sum(inl), inl

    keys = jax.random.split(key, iters)
    scores, inls = jax.vmap(trial)(keys)
    best = jnp.argmax(scores)
    inlier = inls[best]
    pose = estimate_rigid(src, dst, inlier.astype(jnp.float32) + 1e-9)
    err = jnp.linalg.norm(pose.apply(src) - dst, axis=-1)
    inlier = (err < inlier_thresh) & valid
    pose = estimate_rigid(src, dst, inlier.astype(jnp.float32) + 1e-9)
    return pose, inlier


# ---------------------------------------------------------------------------
# Pose-graph refinement (Gauss-Newton, edge-parallel with psum reduction)
# ---------------------------------------------------------------------------

def _edge_residual(poses: Pose, i, j, meas: Pose):
    """6-D residual of edge (i, j): Log(T_meas^-1 * T_i^-1 * T_j)."""
    Ti = Pose(poses.R[i], poses.t[i])
    Tj = Pose(poses.R[j], poses.t[j])
    pred = Ti.inverse().compose(Tj)     # measured frame: T_ij maps j -> i
    err = meas.inverse().compose(pred)
    rw = log_so3(err.R)
    rt = err.t
    return jnp.concatenate([rw, rt], -1)


def _edge_system(poses: Pose, edges_i, edges_j, meas: Pose, n_poses: int):
    """Assemble the Gauss-Newton normal equations from all edges (batched,
    numerical Jacobians on the 6-DoF tangent of each endpoint)."""

    def one_edge(i, j, mR, mt):
        m = Pose(mR, mt)

        def r_of(delta):
            di, dj = delta[:6], delta[6:]
            Ri = exp_so3(di[:3]) @ poses.R[i]
            ti = poses.t[i] + di[3:]
            Rj = exp_so3(dj[:3]) @ poses.R[j]
            tj = poses.t[j] + dj[3:]
            Ti = Pose(Ri, ti)
            Tj = Pose(Rj, tj)
            pred = Ti.inverse().compose(Tj)
            err = m.inverse().compose(pred)
            return jnp.concatenate([log_so3(err.R), err.t], -1)

        r0 = r_of(jnp.zeros(12))
        J = jax.jacfwd(r_of)(jnp.zeros(12))  # (6, 12)
        return r0, J

    r0s, Js = jax.vmap(one_edge)(edges_i, edges_j, meas.R, meas.t)

    # scatter into the big system H (6N x 6N), b (6N). The zero init is
    # derived from the edge data so its shard_map "varying" type matches the
    # scan carry when edges are device-sharded.
    N6 = 6 * n_poses
    zero = jnp.float32(0.0) * jnp.sum(r0s)
    H = jnp.zeros((N6, N6)) + zero
    b = jnp.zeros(N6) + zero

    def scatter(carry, inp):
        H, b = carry
        i, j, r0, J = inp
        Ji = J[:, :6]
        Jj = J[:, 6:]
        oi = 6 * i
        oj = 6 * j
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (oi, oi), (6, 6)) + Ji.T @ Ji, (oi, oi))
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (oj, oj), (6, 6)) + Jj.T @ Jj, (oj, oj))
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (oi, oj), (6, 6)) + Ji.T @ Jj, (oi, oj))
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (oj, oi), (6, 6)) + Jj.T @ Ji, (oj, oi))
        b = jax.lax.dynamic_update_slice(
            b, jax.lax.dynamic_slice(b, (oi,), (6,)) + Ji.T @ r0, (oi,))
        b = jax.lax.dynamic_update_slice(
            b, jax.lax.dynamic_slice(b, (oj,), (6,)) + Jj.T @ r0, (oj,))
        return (H, b), None

    (H, b), _ = jax.lax.scan(scatter, (H, b), (edges_i, edges_j, r0s, Js))
    return H, b


def refine_pose_graph(
    poses: Pose,
    edges_i: jnp.ndarray,
    edges_j: jnp.ndarray,
    measurements: Pose,
    iters: int = 10,
    damping: float = 1e-4,
) -> Pose:
    """Gauss-Newton refinement with pose 0 anchored (gauge fixing)."""
    n = poses.R.shape[0]

    def step(poses, _):
        H, b = _edge_system(poses, edges_i, edges_j, measurements, n)
        # anchor pose 0: clamp its 6 dofs
        big = 1e12
        anchor = jnp.zeros(6 * n).at[:6].set(big)
        Hd = H + jnp.diag(anchor + damping)
        delta = -jnp.linalg.solve(Hd, b)
        delta = delta.reshape(n, 6)
        R = exp_so3(delta[:, :3]) @ poses.R
        t = poses.t + delta[:, 3:]
        return Pose(R, t), jnp.sqrt(jnp.mean(b * b))

    poses, res = jax.lax.scan(step, poses, None, length=iters)
    return poses


def refine_pose_graph_sharded(
    poses: Pose,
    edges_i: jnp.ndarray,
    edges_j: jnp.ndarray,
    measurements: Pose,
    mesh,
    iters: int = 10,
    damping: float = 1e-6,
) -> Pose:
    """Distributed variant: edges sharded across the mesh; each device
    assembles the normal-equation contribution of its edge shard and the
    full (6N x 6N) system is reduced with psum before the (replicated,
    tiny) solve. Edge count must divide the mesh size (pad with self-edges
    (0, 0, identity) which contribute only to the anchored block)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = poses.R.shape[0]

    def local(poses_R, poses_t, ei, ej, mR, mt):
        pl = Pose(poses_R, poses_t)
        H, b = _edge_system(pl, ei, ej, Pose(mR, mt), n)
        H = jax.lax.psum(H, BLOCK_AXIS)
        b = jax.lax.psum(b, BLOCK_AXIS)
        return H, b

    smap = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(P(), P()),
    )

    def step(poses, _):
        H, b = smap(poses.R, poses.t, edges_i, edges_j,
                    measurements.R, measurements.t)
        big = 1e12
        anchor = jnp.zeros(6 * n).at[:6].set(big)
        Hd = H + jnp.diag(anchor + damping)
        delta = (-jnp.linalg.solve(Hd, b)).reshape(n, 6)
        R = exp_so3(delta[:, :3]) @ poses.R
        t = poses.t + delta[:, 3:]
        return Pose(R, t), None

    poses, _ = jax.lax.scan(step, poses, None, length=iters)
    return poses
