"""Descriptor extraction: batched icosahedral gradient histograms.

Reference: Extract_Descriptor_Imp (Src/cSIFT3D.cc:1152-1381) walks a
spherical window per keypoint, rotates each voxel offset/gradient into the
keypoint eigenframe, finds the icosahedron face the gradient ray pierces
(<=20 Moller-Trumbore tests with first-hit semantics,
Src/cSIFT3D.cc:1542-1573), and scatter-adds barycentric x trilinear weights
into a 4x4x4x12 = 768-bin histogram.

TPU-first design (no scatters):
- windows are gathered per level batch like the orientation stage;
- all 20 face tests run as an unrolled first-hit select over the flattened
  window voxels;
- the scatter becomes a *dense separable contraction*: per voxel we build
  4-vectors of per-axis spatial weights (exactly two nonzeros each — the
  trunc-based bins of Src/cSIFT3D.cc:1417-1431) and a 12-vector of
  barycentric vertex weights; the 768-bin histogram is then
  desc[x,y,z,v] = sum_c Wx[c,x] Wy[c,y] Wz[c,z] B[c,v],
  evaluated as two MXU matmuls ((C,16)^T @ (C,48)). Deterministic, no
  atomics, no scatter serialisation.

Parity notes: the spatial base bin uses C-style trunc-toward-zero while the
fraction uses floorf (reference mixes both; replicated exactly via int32
cast + jnp.floor). Descriptor normalise -> truncate(0.0333) -> renormalise
per Src/cSIFT3D.cc:1350-1358.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    BARY_EPS,
    DBL_EPSILON,
    DESC_NUMEL,
    DESC_RAD_FCTR,
    DESC_SIG_FCTR,
    NHIST_PER_DIM,
    SiftConfig,
)
from ..geometry import MESH_CONST, TRI_IDX
from ..pyramid import LevelMeta
from . import windows as W
from .detect import LevelDetections

_FLOAT_BUDGET = 2 ** 27  # ~128M live floats in the windowed stage per block


class DescriptorResult(NamedTuple):
    desc: jnp.ndarray  # (cap, 768) f32


def _first_hit_faces(gr: jnp.ndarray):
    """Vectorised Check_intersect_faces over flattened gradients gr: (..., 3).

    Returns (face_idx int32 (...,), bary (..., 3)); face_idx = -1 if no hit.
    First face in table order wins, matching the reference's early return.
    """
    e1 = jnp.asarray(MESH_CONST["e1"])  # (20, 3)
    e2 = jnp.asarray(MESH_CONST["e2"])
    t = jnp.asarray(MESH_CONST["t"])
    q = jnp.asarray(MESH_CONST["q"])
    qe2 = jnp.sum(q * e2, axis=-1)      # (20,)

    nondeg = jnp.sum(gr * gr, axis=-1) >= jnp.float32(BARY_EPS)

    found = jnp.zeros(gr.shape[:-1], bool)
    face = jnp.full(gr.shape[:-1], -1, jnp.int32)
    bary = jnp.zeros(gr.shape[:-1] + (3,), jnp.float32)

    for i in range(e1.shape[0]):
        p = jnp.cross(gr, e2[i])
        det = jnp.sum(e1[i] * p, axis=-1)
        det_ok = jnp.abs(det) >= jnp.float32(BARY_EPS)
        det_inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
        by = det_inv * jnp.sum(p * t[i], axis=-1)
        bz = det_inv * jnp.sum(gr * q[i], axis=-1)
        bx = 1.0 - by - bz
        k = det_inv * qe2[i]
        ok = (
            nondeg
            & det_ok
            & (bx >= -BARY_EPS)
            & (by >= -BARY_EPS)
            & (bz >= -BARY_EPS)
            & (k >= 0)
        )
        new = ok & ~found
        face = jnp.where(new, i, face)
        bary = jnp.where(
            new[..., None], jnp.stack([bx, by, bz], axis=-1).astype(jnp.float32), bary
        )
        found = found | ok
    return face, bary


def _axis_weights(vb: jnp.ndarray) -> jnp.ndarray:
    """Per-axis spatial weights over the 4 bins: two nonzeros at
    base = trunc(vb) and base+1 with weights (1 - frac, frac), where
    frac = vb - floor(vb) (reference's trunc/floor mix)."""
    base = vb.astype(jnp.int32)  # trunc toward zero
    frac = (vb - jnp.floor(vb)).astype(jnp.float32)
    bins = jnp.arange(NHIST_PER_DIM, dtype=jnp.int32)
    w_lo = (bins == base[..., None]).astype(jnp.float32) * (1.0 - frac)[..., None]
    w_hi = (bins == (base + 1)[..., None]).astype(jnp.float32) * frac[..., None]
    return w_lo + w_hi  # (..., 4)


def _use_pallas(cfg: SiftConfig) -> bool:
    if cfg.use_pallas is not None:
        return cfg.use_pallas
    return jax.default_backend() == "tpu"


def _core_offset_maps(wshape, cp):
    """Per-axis core-voxel offset maps (cp,) int32, padded with sentinels
    that fail every box test."""
    wz, wy, wx = (w - 2 for w in wshape)
    c = wz * wy * wx
    idx = np.arange(c, dtype=np.int64)
    jz = (idx // (wy * wx)).astype(np.int32)
    jy = ((idx // wx) % wy).astype(np.int32)
    jx = (idx % wx).astype(np.int32)
    pad = cp - c
    big = np.int32(1 << 20)
    return (
        np.concatenate([jz, np.full(pad, big, np.int32)]),
        np.concatenate([jy, np.full(pad, big, np.int32)]),
        np.concatenate([jx, np.full(pad, big, np.int32)]),
    )


def _desc_one_block_pallas(
    gss_pad, bx, by, bz, rot, kp_ok, meta: LevelMeta, consts, z_off=0,
    y_off=0,
):
    """Pallas-kernel variant of _desc_one_block (same outputs).

    v5 contract: the kernel receives RAW window values (one whole-window
    block per keypoint) and computes the central differences itself, so no
    (B, C) gradient streams ever hit HBM."""
    from .pallas.descriptor_kernel import (
        SPHERE_SKIP,
        TILE,
        descriptor_bins_pallas,
        tile_entry_table,
        tile_z_ranges,
        window_offset_maps,
    )

    (r_vox, win_radius, sigma, desc_hw, desc_bin_fctr, wshape) = consts
    nz, ny, nx = meta.shape
    unit = meta.unit
    B = bx.shape[0]
    Wz, Wy, Wx = wshape
    Cw = Wz * Wy * Wx
    Cp = -(-Cw // TILE) * TILE

    wins, starts = W.gather_windows(
        gss_pad, bx, by, bz, wshape, z_off=z_off, nzp=nz + 2,
        y_off=y_off, nyp=ny + 2, use_pallas=True,
    )
    win = jnp.pad(wins.reshape(B, Cw), ((0, 0), (0, Cp - Cw)))

    maps_np = window_offset_maps(wshape, Cp)
    if SPHERE_SKIP:
        ztab = jnp.asarray(tile_entry_table(maps_np[0], maps_np[1]))
    else:
        ztab = jnp.asarray(tile_z_ranges(maps_np[0]))
    jzm, jym, jxm = (jnp.asarray(m) for m in maps_np)

    xs_lo, xs_hi = W.box_bounds(bx, r_vox, nx)
    ys_lo, ys_hi = W.box_bounds(by, r_vox, ny)
    zs_lo, zs_hi = W.box_bounds(bz, r_vox, nz)
    sz, sy, sx = starts
    kpi = jnp.stack(
        [sz, sy, sx, bx, by, bz, xs_lo, xs_hi, ys_lo, ys_hi, zs_lo, zs_hi],
        axis=1,
    ).astype(jnp.int32)
    kpok = kp_ok.astype(jnp.int32)
    rotT = jnp.swapaxes(rot, 1, 2).reshape(B, 9)
    rotT = jnp.pad(rotT, ((0, 0), (0, 7)))

    consts_k = (
        float(unit), float(win_radius), float(sigma),
        float(desc_hw), float(desc_bin_fctr),
    )
    interpret = jax.default_backend() != "tpu"
    T = descriptor_bins_pallas(
        win, jzm, jym, jxm, ztab, kpi, kpok, rotT, wshape, consts_k,
        interpret=interpret,
    )
    desc = (
        T.reshape(B, 4, 4, 4, 12)
        .transpose(0, 3, 2, 1, 4)
        .reshape(B, DESC_NUMEL)
    )
    return desc


def _desc_one_block(
    gss_pad, bx, by, bz, rot, kp_ok, meta: LevelMeta, consts, z_off=0,
    y_off=0,
):
    """Descriptors for one block of keypoints. rot: (B, 3, 3) (columns
    [v1 v2 vr]); the reference transposes it before use
    (Src/cSIFT3D.cc:1214), so voxel vectors are contracted as v @ R."""
    (r_vox, win_radius, sigma, desc_hw, desc_bin_fctr, wshape) = consts
    nz, ny, nx = meta.shape
    unit = meta.unit
    B = bx.shape[0]
    Wz, Wy, Wx = wshape
    C = (Wz - 2) * (Wy - 2) * (Wx - 2)

    wins, starts = W.gather_windows(
        gss_pad, bx, by, bz, wshape, z_off=z_off, nzp=nz + 2,
        y_off=y_off, nyp=ny + 2,
    )
    az, ay, ax = W.core_coords(starts, wshape)
    gx, gy, gz = W.central_gradients(wins, unit)

    # Flatten window voxels to (B, C) immediately: everything after the
    # gradients is per-voxel math, and XLA compiles/fuses large 2-D graphs
    # far faster than the equivalent 5-D ones.
    core = (Wz - 2, Wy - 2, Wx - 2)
    gx = gx.reshape(B, C)
    gy = gy.reshape(B, C)
    gz = gz.reshape(B, C)

    def expand(v, axis):
        shape = [1, 1, 1]
        shape[axis] = core[axis]
        return jnp.broadcast_to(
            v.reshape((B,) + tuple(shape)), (B,) + core
        ).reshape(B, C)

    xs_lo, xs_hi = W.box_bounds(bx, r_vox, nx)
    ys_lo, ys_hi = W.box_bounds(by, r_vox, ny)
    zs_lo, zs_hi = W.box_bounds(bz, r_vox, nz)
    mx = expand((ax >= xs_lo[:, None]) & (ax <= xs_hi[:, None]), 2)
    my = expand((ay >= ys_lo[:, None]) & (ay <= ys_hi[:, None]), 1)
    mz = expand((az >= zs_lo[:, None]) & (az <= zs_hi[:, None]), 0)

    u = jnp.float32(unit)
    dx = expand((ax.astype(jnp.float32) - bx.astype(jnp.float32)[:, None]) * u, 2)
    dy = expand((ay.astype(jnp.float32) - by.astype(jnp.float32)[:, None]) * u, 1)
    dz = expand((az.astype(jnp.float32) - bz.astype(jnp.float32)[:, None]) * u, 0)

    sq = dz * dz + dy * dy + dx * dx
    in_box = mz & my & mx
    r2 = jnp.float32(win_radius) * jnp.float32(win_radius)
    in_sphere = sq <= r2

    disp = jnp.stack([dx, dy, dz], axis=-1)  # (B, C, 3)

    # vrot = R^T disp  ==  disp @ R (per keypoint)
    vrot = jnp.einsum("bci,bij->bcj", disp, rot,
                      precision=jax.lax.Precision.HIGHEST)
    vbins = (vrot + jnp.float32(desc_hw)) * jnp.float32(desc_bin_fctr) - jnp.float32(0.5)
    bins_ok = jnp.all((vbins > -0.5) & (vbins < 3.5), axis=-1)

    sigma2 = jnp.float32(sigma) * jnp.float32(sigma)
    wgt = jnp.exp(jnp.float32(-0.5) * sq / sigma2)
    grad = jnp.stack([gx, gy, gz], axis=-1) * wgt[..., None]
    grad_rot = jnp.einsum("bci,bij->bcj", grad, rot,
                          precision=jax.lax.Precision.HIGHEST)

    face, bary = _first_hit_faces(grad_rot)
    mag = jnp.sqrt(jnp.sum(grad_rot * grad_rot, axis=-1))

    contrib = in_box & in_sphere & bins_ok & (face >= 0) & kp_ok[:, None]

    # Dense separable binning -> two MXU matmuls per keypoint.
    wx4 = _axis_weights(vbins[..., 0])
    wy4 = _axis_weights(vbins[..., 1])
    wz4 = _axis_weights(vbins[..., 2])

    vids = jnp.asarray(TRI_IDX)[jnp.clip(face, 0, 19)]  # (B, C, 3)
    scale_c = jnp.where(contrib, mag, 0.0)              # (B, C)
    bary_c = bary
    verts = jnp.arange(12, dtype=jnp.int32)
    Bmat = jnp.sum(
        (vids[..., None] == verts) * bary_c[..., None], axis=2
    ) * scale_c[..., None]  # (B, C, 12)

    hi = jax.lax.Precision.HIGHEST
    G = (wx4[:, :, :, None] * wy4[:, :, None, :]).reshape(B, C, 16)
    H = (wz4[:, :, :, None] * Bmat[:, :, None, :]).reshape(B, C, 48)
    T = jnp.einsum("bcg,bch->bgh", G, H, precision=hi)  # (B, 16, 48)

    desc = (
        T.reshape(B, 4, 4, 4, 12)        # (x, y, z, v)
        .transpose(0, 3, 2, 1, 4)        # (z, y, x, v) — hist = x + 4y + 16z
        .reshape(B, DESC_NUMEL)
    )
    return desc


def _normalize(desc: jnp.ndarray) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True)) + jnp.float32(DBL_EPSILON)
    return desc / norm


def extract_descriptors(
    gss_pad: jnp.ndarray,
    det: LevelDetections,
    rot: jnp.ndarray,
    accepted: jnp.ndarray,
    meta: LevelMeta,
    cfg: SiftConfig,
    z_off=0,
    y_off=0,
) -> DescriptorResult:
    """Descriptor stage for one pyramid level.

    det: level detections (cap); rot: (cap, 3, 3); accepted: (cap,) bool —
    keypoints that survived orientation. `z_off`/`y_off`: slab offsets when
    gss_pad is a halo-extended local block (multi-chip path); 0 single-chip.
    """
    scale32 = np.float32(meta.scale)
    sigma = float(np.float32(scale32 * np.float32(DESC_SIG_FCTR)))
    win_radius = float(np.float32(np.float32(DESC_RAD_FCTR) * np.float32(sigma)))
    desc_hw = float(np.float32(win_radius / math.sqrt(2.0)))
    desc_width = float(np.float32(2.0 * desc_hw))
    desc_bin_fctr = float(np.float32(np.float32(NHIST_PER_DIM) / np.float32(desc_width)))
    r_vox = W.radius_voxels(win_radius, meta.unit)
    wshape = tuple(W.window_size(r_vox, n + 2) for n in meta.shape)

    consts = (r_vox, win_radius, sigma, desc_hw, desc_bin_fctr, wshape)

    C = (wshape[0] - 2) * (wshape[1] - 2) * (wshape[2] - 2)
    # Live floats per window voxel in the XLA stage: the Pallas path only
    # materialises the raw gathered window (+pad copies), the XLA path
    # ~40 per-voxel intermediates — so Pallas blocks can be ~7x larger
    # (fewer while-loop trips at big windows; kernel VMEM is per-keypoint
    # and unaffected by the block size).
    per_voxel = 6 if _use_pallas(cfg) else 40
    block = int(np.clip(_FLOAT_BUDGET // max(per_voxel * C, 1), 1, cfg.kp_block))

    cap = det.x.shape[0]
    nblocks = -(-cap // block)
    pad = nblocks * block - cap
    xs = jnp.pad(det.x, (0, pad))
    ys = jnp.pad(det.y, (0, pad))
    zs = jnp.pad(det.z, (0, pad))
    rots = jnp.pad(rot, ((0, pad), (0, 0), (0, 0)))
    oks = jnp.pad(accepted, (0, pad))

    # Accepted keypoints form a dense prefix (pipeline compaction), so a
    # while_loop over ceil(n_accepted / block) blocks does exactly the
    # necessary window work and empty levels cost nothing.
    n_acc = jnp.sum(accepted.astype(jnp.int32))
    nneeded = (n_acc + block - 1) // block

    def cond(state):
        return state[0] < nneeded

    block_fn = _desc_one_block_pallas if _use_pallas(cfg) else _desc_one_block

    def body(state):
        i, acc = state
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * block, block)
        d = block_fn(
            gss_pad, sl(xs), sl(ys), sl(zs), sl(rots), sl(oks), meta, consts,
            z_off, y_off,
        )
        acc = jax.lax.dynamic_update_slice(acc, d, (i * block, 0))
        return i + 1, acc

    desc0 = jnp.zeros((nblocks * block, DESC_NUMEL), jnp.float32)
    _, desc = jax.lax.while_loop(cond, body, (jnp.int32(0), desc0))
    desc = desc[:cap]

    desc = _normalize(desc)
    desc = jnp.minimum(desc, jnp.float32(0.2 * 128 / DESC_NUMEL))
    desc = _normalize(desc)
    desc = jnp.where(accepted[:, None], desc, 0.0)
    return DescriptorResult(desc=desc)
