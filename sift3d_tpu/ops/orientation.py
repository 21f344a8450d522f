"""Orientation assignment: batched structure tensors + eigenframes.

The reference processes one keypoint at a time with an OpenMP dynamic loop
(Assign_Orientation, Src/cSIFT3D.cc:427-482; Assign_Orientation_Imp,
Src/cSIFT3D.cc:913-1138), calling Eigen's general EigenSolver per keypoint.
TPU-first equivalent: keypoints of a pyramid level are processed as a batch —
windows gathered with vmapped dynamic_slice, Gaussian-weighted structure
tensors accumulated as masked reductions, then a *batched* symmetric 3x3
eigendecomposition. The rejection cascade (weak gradient -> -1, eigenvalue
ratio / distinctness -> -2, corner score -> -3) and the sign-fixed rotation
construction (R columns [v1 v2 v1 x v2], Src/cSIFT3D.cc:1084-1135) are
replicated as vectorised masks.
"""

from __future__ import annotations

import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp

# A/B knob, read ONCE at import (the surrounding jit modules are cached by
# shape, so a mid-process toggle would silently time an identical program —
# advisor r4). Measured on TPU v5e at 256^3: MULT=4 0.617 s vs 0.592 —
# rejected; stays 1. Set in the environment before importing sift3d_tpu.
ORI_BLOCK_MULT = int(_os.environ.get("SIFT3D_ORI_BLOCK_MULT", "1"))

from ..config import DBL_EPSILON, ORI_GRAD_THRESH, ORI_RAD_FCTR, ORI_SIG_FCTR, SiftConfig
from ..pyramid import LevelMeta
from . import windows as W
from .detect import LevelDetections


class OrientationResult(NamedTuple):
    status: jnp.ndarray      # (cap,) int32: 1 ok, -1/-2/-3 rejection reasons
    rotation: jnp.ndarray    # (cap, 3, 3) f32 (columns [v1 v2 v1xv2])
    str_tensor: jnp.ndarray  # (cap, 3, 3) f32
    mean_grad: jnp.ndarray   # (cap, 3) f32


def _window_stats(
    gss_pad: jnp.ndarray,
    det: LevelDetections,
    meta: LevelMeta,
    r_vox: float,
    win_radius_phys: float,
    sigma_phys: float,
    wshape: tuple[int, int, int],
    cfg: SiftConfig,
    z_off=0,
    y_off=0,
):
    """Structure tensor (cap, 6) + mean gradient (cap, 3), chunked over
    keypoints so only kp_block windows are live at once.

    SIFT3D_ORI_BLOCK_MULT widens the orientation block only (A/B knob,
    module-level ORI_BLOCK_MULT, read at import). Measured on TPU v5e at
    256^3 (r4): MULT=4 0.617 s vs 0.592 — the while_loop processes
    ceil(count/block)*block lanes, and the last block's padded lanes do
    full window-gather+kernel work (up to block-1 wasted windows per level
    x 30 levels), costing more than the saved per-iteration overhead.
    Rejected; stays 1."""
    kp_block = cfg.kp_block * ORI_BLOCK_MULT
    nz, ny, nx = meta.shape
    nzp = nz + 2  # global padded extents (gss_pad may be a local slab)
    nyp = ny + 2
    unit = meta.unit
    cap = det.x.shape[0]
    nblocks = -(-cap // kp_block)
    pad = nblocks * kp_block - cap

    xs = jnp.pad(det.x, (0, pad))
    ys = jnp.pad(det.y, (0, pad))
    zs = jnp.pad(det.z, (0, pad))
    sigma2 = jnp.float32(sigma_phys) * jnp.float32(sigma_phys)
    # Sphere test in physical units: sq_disp > win_radius^2 skips
    # (Src/cSIFT3D.cc:967-969).
    r2 = jnp.float32(win_radius_phys) * jnp.float32(win_radius_phys)

    def block(args):
        bx, by, bz = args
        wins, starts = W.gather_windows(
            gss_pad, bx, by, bz, wshape, z_off=z_off, nzp=nzp,
            y_off=y_off, nyp=nyp,
        )
        az, ay, ax = W.core_coords(starts, wshape)
        gx, gy, gz = W.central_gradients(wins, unit)

        # Reference clamped box (per keypoint, exact f32 floor/ceil).
        xs_lo, xs_hi = W.box_bounds(bx, r_vox, nx)
        ys_lo, ys_hi = W.box_bounds(by, r_vox, ny)
        zs_lo, zs_hi = W.box_bounds(bz, r_vox, nz)
        mx = (ax >= xs_lo[:, None]) & (ax <= xs_hi[:, None])
        my = (ay >= ys_lo[:, None]) & (ay <= ys_hi[:, None])
        mz = (az >= zs_lo[:, None]) & (az <= zs_hi[:, None])

        u = jnp.float32(unit)
        dx = (ax.astype(jnp.float32) - bx.astype(jnp.float32)[:, None]) * u
        dy = (ay.astype(jnp.float32) - by.astype(jnp.float32)[:, None]) * u
        dz = (az.astype(jnp.float32) - bz.astype(jnp.float32)[:, None]) * u
        sq = (
            dz[:, :, None, None] ** 2
            + dy[:, None, :, None] ** 2
            + dx[:, None, None, :] ** 2
        )
        in_box = (
            mz[:, :, None, None] & my[:, None, :, None] & mx[:, None, None, :]
        )
        inside = in_box & (sq <= r2)

        w = jnp.where(inside, jnp.exp(jnp.float32(-0.5) * sq / sigma2), 0.0)

        def rsum(v):
            return jnp.sum(v, axis=(1, 2, 3))

        st = jnp.stack(
            [
                rsum(gx * gx * w), rsum(gx * gy * w), rsum(gx * gz * w),
                rsum(gy * gy * w), rsum(gy * gz * w), rsum(gz * gz * w),
            ],
            axis=-1,
        )
        mg = jnp.stack([rsum(gx * w), rsum(gy * w), rsum(gz * w)], axis=-1)
        return st, mg

    def block_pallas(args):
        """Pallas-kernel variant of `block` (ops/pallas/orientation_kernel):
        the kernel receives raw window values and computes the central
        differences itself (no (B, C) gradient streams in HBM)."""
        from .pallas.orientation_kernel import (
            TILE,
            orientation_stats_pallas,
            ori_tile_z_ranges,
            ori_window_maps,
        )

        bx, by, bz = args
        B = bx.shape[0]
        Wz, Wy, Wx = wshape
        Cw = Wz * Wy * Wx
        Cp = -(-Cw // TILE) * TILE

        wins, starts = W.gather_windows(
            gss_pad, bx, by, bz, wshape, z_off=z_off, nzp=nzp,
            y_off=y_off, nyp=nyp, use_pallas=True,
        )
        win = jnp.pad(wins.reshape(B, Cw), ((0, 0), (0, Cp - Cw)))
        maps_np = ori_window_maps(wshape, Cp)
        ztab = jnp.asarray(ori_tile_z_ranges(maps_np[0]))
        jzm, jym, jxm = (jnp.asarray(m) for m in maps_np)

        xs_lo, xs_hi = W.box_bounds(bx, r_vox, nx)
        ys_lo, ys_hi = W.box_bounds(by, r_vox, ny)
        zs_lo, zs_hi = W.box_bounds(bz, r_vox, nz)
        sz, sy, sx = starts
        kpi = jnp.stack(
            [sz, sy, sx, bx, by, bz, xs_lo, xs_hi, ys_lo, ys_hi, zs_lo, zs_hi],
            axis=1,
        ).astype(jnp.int32)
        kpok = jnp.ones((B,), jnp.int32)
        consts = (float(unit), float(win_radius_phys), float(sigma_phys))
        interp = jax.default_backend() != "tpu"
        return orientation_stats_pallas(
            win, jzm, jym, jxm, ztab, kpi, kpok, wshape, consts,
            interpret=interp,
        )

    from .descriptor import _use_pallas

    if _use_pallas(cfg):
        block = block_pallas

    # Iterate exactly ceil(count / kp_block) blocks (detections are a dense
    # prefix after compaction); a while_loop runs only the needed blocks so
    # empty levels cost nothing.
    count = jnp.minimum(det.count, cap)
    nneeded = (count + kp_block - 1) // kp_block

    st0 = jnp.zeros((nblocks * kp_block, 6), jnp.float32)
    mg0 = jnp.zeros((nblocks * kp_block, 3), jnp.float32)

    def cond(state):
        return state[0] < nneeded

    def body(state):
        i, st_acc, mg_acc = state
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * kp_block, kp_block)
        st_b, mg_b = block((sl(xs), sl(ys), sl(zs)))
        st_acc = jax.lax.dynamic_update_slice(st_acc, st_b, (i * kp_block, 0))
        mg_acc = jax.lax.dynamic_update_slice(mg_acc, mg_b, (i * kp_block, 0))
        return i + 1, st_acc, mg_acc

    _, st, mg = jax.lax.while_loop(cond, body, (jnp.int32(0), st0, mg0))
    return st[:cap], mg[:cap]


def _sym_from_packed(st: jnp.ndarray) -> jnp.ndarray:
    """(cap, 6) [xx, xy, xz, yy, yz, zz] -> (cap, 3, 3) symmetric."""
    xx, xy, xz, yy, yz, zz = [st[:, i] for i in range(6)]
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1),
        ],
        axis=-2,
    )


def assign_orientation(
    gss_pad: jnp.ndarray,
    det: LevelDetections,
    meta: LevelMeta,
    cfg: SiftConfig,
    z_off=0,
    y_off=0,
) -> OrientationResult:
    """Full orientation stage for one pyramid level.

    `z_off`/`y_off`: slab offsets when `gss_pad` is a halo-extended local
    block of the level (multi-chip shard_map path); 0 on a single chip."""
    import numpy as np

    scale32 = np.float32(meta.scale)
    sigma = float(np.float32(np.float32(ORI_SIG_FCTR) * scale32))
    win_radius = float(np.float32(np.float32(sigma) * np.float32(ORI_RAD_FCTR)))
    r_vox = W.radius_voxels(win_radius, meta.unit)
    wsz = tuple(
        W.window_size(r_vox, n + 2) for n in meta.shape
    )  # (Wz, Wy, Wx) against padded dims

    st_packed, mg = _window_stats(
        gss_pad, det, meta, r_vox, win_radius, sigma, wsz, cfg,
        z_off=z_off, y_off=y_off,
    )
    st = _sym_from_packed(st_packed)

    # --- rejection cascade -------------------------------------------------
    mg_sq = jnp.sum(mg * mg, axis=-1)
    weak = mg_sq < jnp.float32(ORI_GRAD_THRESH)

    # Batched closed-form symmetric eigensolve (ascending, unit columns) —
    # replaces the reference's per-keypoint general EigenSolver and XLA's
    # QR-iteration eigh custom call (ops/eigen3.py).
    from .eigen3 import eigh3x3

    vals, vecs = eigh3x3(st)

    ratio_bad = (jnp.abs(vals[:, 0] / vals[:, 1]) > cfg.max_eig_thres) | (
        jnp.abs(vals[:, 1] / vals[:, 2]) > cfg.max_eig_thres
    )
    indistinct = (
        (jnp.abs(vals[:, 0] - vals[:, 1]) < DBL_EPSILON)
        | (jnp.abs(vals[:, 0] - vals[:, 2]) < DBL_EPSILON)
        | (jnp.abs(vals[:, 2] - vals[:, 1]) < DBL_EPSILON)
    )

    # Sign fixing + corner score on the two dominant eigenvectors
    # (Src/cSIFT3D.cc:1084-1113).
    d_norm = jnp.sqrt(mg_sq)
    v_hi = vecs[:, :, 2]
    v_mid = vecs[:, :, 1]

    def cos_and_sign(v):
        d = jnp.sum(v * mg, axis=-1)
        q_norm = jnp.sqrt(jnp.sum(v * v, axis=-1))
        cos_ang = d / (d_norm * q_norm)
        sgn = jnp.where(d > 0.0, 1.0, -1.0).astype(jnp.float32)
        return jnp.abs(cos_ang), v * sgn[:, None]

    cos_hi, v1 = cos_and_sign(v_hi)
    cos_mid, v2 = cos_and_sign(v_mid)
    corner_score = jnp.minimum(cos_hi, cos_mid)
    corner_bad = corner_score < cfg.corner_thresh

    vr = jnp.cross(v1, v2)
    rot = jnp.stack([v1, v2, vr], axis=-1)  # columns [v1 v2 vr]

    status = jnp.full(weak.shape, 1, jnp.int32)
    status = jnp.where(corner_bad, -3, status)
    status = jnp.where(ratio_bad | indistinct, -2, status)
    status = jnp.where(weak, -1, status)
    status = jnp.where(det.valid, status, 0)

    return OrientationResult(
        status=status, rotation=rot, str_tensor=st, mean_grad=mg
    )
