"""CPU oracle: a line-faithful NumPy implementation of the reference 3D SIFT.

This module re-implements the reference pipeline (`Src/cSIFT3D.cc`,
`Src/cMatcher.cc`) with the same arithmetic and decision semantics, serving as
the golden-intermediate generator for parity tests of the TPU pipeline — the
first-class version of the reference's dump-everything-and-diff protocol
(SURVEY.md §4). It is deliberately written against the reference's *loop
semantics* (two-pass convolution with boundary mirroring, strict 8-neighbour
extremum test, rejection cascade, truncation-based descriptor binning) rather
than sharing operator code with the JAX pipeline, so the two sides are
independent implementations of the same math.

Everything is float32 unless the reference promotes to double.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from ..config import (
    BARY_EPS,
    CONV_EPS,
    DBL_EPSILON,
    DESC_NUMEL,
    DESC_RAD_FCTR,
    DESC_SIG_FCTR,
    ICOS_NFACES,
    IMG_BORDER,
    NHIST_PER_DIM,
    ORI_GRAD_THRESH,
    ORI_RAD_FCTR,
    ORI_SIG_FCTR,
    SiftConfig,
)
from ..geometry import TRI_IDX, TRI_VERTS

F32 = np.float32


# ---------------------------------------------------------------------------
# Volume container bookkeeping
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Level:
    """Volume plus unit/scale metadata (the reference's TexImage,
    Include/Util/cTexImage.h). data is (nz, ny, nx) float32; x fastest."""

    data: np.ndarray
    unit: float
    scale: float


@dataclasses.dataclass
class OracleKeypoint:
    x: int
    y: int
    z: int
    octave: int
    level: int
    scale: float
    # filled by orientation
    status: int = 0            # 1 accepted; -1 weak grad; -2 eig; -3 corner
    rotation: np.ndarray | None = None   # (3,3), row-major like kp.Rotation
    # extract_descriptor transposes `rotation` in place, like the reference
    # (Src/cSIFT3D.cc:1214); this flag makes the hazard explicit so a repeat
    # call cannot silently un-transpose it.
    rotation_is_descriptor_frame: bool = False
    str_tensor: np.ndarray | None = None
    eigvals: np.ndarray | None = None
    # filled by descriptor
    desc: np.ndarray | None = None       # (768,)
    rx: float = -1.0
    ry: float = -1.0
    rz: float = -1.0


@dataclasses.dataclass
class OracleResult:
    keypoints: list[OracleKeypoint]        # accepted ("filter") keypoints
    all_extrema: list[OracleKeypoint]      # pre-orientation extrema
    gss: list[Level]
    dog: list[Level]
    dog_thresholds: list[float]


# ---------------------------------------------------------------------------
# Stage 0: input normalisation (data_scale, Src/cUtil.cc:553-577)
# ---------------------------------------------------------------------------

def data_scale(vol: np.ndarray) -> np.ndarray:
    vol = vol.astype(np.float32)
    m = np.max(np.abs(vol))
    if m == 0.0:
        return vol
    return (vol / m).astype(np.float32)


# ---------------------------------------------------------------------------
# Stage 1: separable Gaussian blur (GaussianSmooth_3D, Src/cSIFT3D.cc:535-790)
# ---------------------------------------------------------------------------

def gaussian_kernel_ref(sigma: float) -> np.ndarray:
    """Reference kernel construction (Src/cSIFT3D.cc:541-572), float32."""
    sigma = sigma if sigma > 0 else 0.0
    half_width = max(int(math.ceil(sigma * 3.0)), 1) if sigma > 0 else 1
    width = 2 * half_width + 1
    kernel = np.zeros(width, dtype=F32)
    acc = F32(0.0)
    for i in range(width):
        x = F32(i - half_width)
        x = F32(float(x) / (sigma + DBL_EPSILON))
        kernel[i] = F32(math.exp(-0.5 * float(x) * float(x)))
        acc = F32(acc + kernel[i])
    return (kernel / acc).astype(F32)


def _conv_axis(vol: np.ndarray, kernel: np.ndarray, axis: int) -> np.ndarray:
    """One axis pass of GaussianSmooth_3D_Imp (Src/cSIFT3D.cc:624-790).

    Interior voxels: direct tap sum (the unit_factor == 1 interpolation is a
    no-op). Boundary voxels: mirrored taps with the conv_eps = 0.1 offset and
    trunc-based linear interpolation. Accumulation follows the reference's
    tap order (d = -hw .. hw).
    """
    width = len(kernel)
    hw = width // 2
    n = vol.shape[axis]
    dim_end = n - 1
    out = np.zeros_like(vol)

    mv = np.moveaxis(vol, axis, 0)    # (n, ...) view
    mo = np.moveaxis(out, axis, 0)

    int_lo, int_hi = hw, n - hw - 2

    # Interior pass
    if int_hi >= int_lo:
        acc = np.zeros_like(mv[int_lo : int_hi + 1])
        for d in range(-hw, hw + 1):
            tap = kernel[d + hw]
            acc += tap * mv[int_lo - d : int_hi + 1 - d]
        mo[int_lo : int_hi + 1] = acc

    # Boundary pass
    for x in range(n):
        if int_lo <= x <= int_hi:
            continue
        acc = np.zeros_like(mv[0])
        for d in range(-hw, hw + 1):
            tap = kernel[d + hw]
            c = F32(F32(x) - F32(d))
            if c < 0:
                c = F32(-c)
            elif c >= dim_end:
                c = F32(F32(2 * dim_end) - c - F32(CONV_EPS))
            idx_lo = int(c)
            frac = F32(c - F32(idx_lo))
            idx_hi = idx_lo + 1
            idx_lo = min(max(idx_lo, 0), n - 1)   # clamp (ref reads OOB here)
            idx_hi = min(max(idx_hi, 0), n - 1)
            acc += tap * ((F32(1.0) - frac) * mv[idx_lo] + frac * mv[idx_hi])
        mo[x] = acc

    return out


def gaussian_smooth_3d(vol: np.ndarray, sigma: float) -> np.ndarray:
    """Axis order X then Y then Z (Src/cSIFT3D.cc:608-617). vol is (nz,ny,nx)."""
    kernel = gaussian_kernel_ref(sigma)
    out = _conv_axis(vol, kernel, axis=2)
    out = _conv_axis(out, kernel, axis=1)
    out = _conv_axis(out, kernel, axis=0)
    return out


def downsample(vol: np.ndarray) -> np.ndarray:
    """Stride-2 decimation (DownSample_3D, Src/cSIFT3D.cc:506-533)."""
    nz, ny, nx = vol.shape
    return vol[: 2 * (nz // 2) : 2, : 2 * (ny // 2) : 2, : 2 * (nx // 2) : 2].copy()


# ---------------------------------------------------------------------------
# Stage 2: pyramid construction
# ---------------------------------------------------------------------------

def build_gss(vol: np.ndarray, cfg: SiftConfig) -> list[Level]:
    """Build_Gaussian_Scale_Space (Src/cSIFT3D.cc:268-319)."""
    nz, ny, nx = vol.shape
    noct = cfg.num_octaves((nx, ny, nz))
    gl = cfg.gss_levels
    sigma0 = F32(cfg.sigma0())
    k = 2.0 ** (1.0 / cfg.num_kp_levels)

    sigmas = np.zeros(gl, dtype=F32)
    sigmas[0] = sigma0
    for i in range(1, gl):
        sig_prev = k ** (i - 1) * float(sigma0)
        sig_total = sig_prev * k
        sigmas[i] = F32(math.sqrt(sig_total * sig_total - sig_prev * sig_prev))

    gss: list[Level] = []
    unit = 1.0
    for o in range(noct):
        for i in range(gl):
            scale = float(sigma0) * 2.0 ** (o + i / cfg.num_kp_levels)
            if o == 0 and i == 0:
                base_sig = math.sqrt(float(sigmas[0]) ** 2 - cfg.sigma_n_default ** 2)
                data = gaussian_smooth_3d(vol, base_sig)
            elif i == 0:
                data = downsample(gss[(o - 1) * gl + cfg.num_kp_levels].data)
            else:
                data = gaussian_smooth_3d(gss[o * gl + i - 1].data, float(sigmas[i]))
            gss.append(Level(data, unit, float(F32(scale))))
        unit *= 2.0
    return gss


def build_dog(gss: list[Level], cfg: SiftConfig, noct: int) -> list[Level]:
    """DoG = prev - cur (Sub negates cur - prev, Src/cSIFT3D.cc:849-882)."""
    gl, dl = cfg.gss_levels, cfg.dog_levels
    dog: list[Level] = []
    for o in range(noct):
        for i in range(1, gl):
            prev, cur = gss[o * gl + i - 1], gss[o * gl + i]
            meta_scale = prev.scale  # DoG level i-1 carries scale of level i-1
            dog.append(Level((prev.data - cur.data).astype(F32), prev.unit, meta_scale))
    assert len(dog) == noct * dl
    return dog


# ---------------------------------------------------------------------------
# Stage 3: keypoint detection (Detect_KeyPoints, Src/cSIFT3D.cc:362-425)
# ---------------------------------------------------------------------------

def detect_keypoints(dog: list[Level], cfg: SiftConfig, noct: int):
    """Adaptive threshold + strict 8-neighbour extremum test
    (IsExtrema_neighbor, Src/cSIFT3D.cc:884-911). Returns (extrema, thresholds)."""
    dl = cfg.dog_levels
    extrema: list[OracleKeypoint] = []
    thresholds: list[float] = []
    for o in range(noct):
        for i in range(1, dl - 1):
            idx = o * dl + i
            cur = dog[idx].data
            prv = dog[idx - 1].data
            nxt = dog[idx + 1].data
            thres = F32(cfg.peak_thresh) * np.max(np.abs(cur))
            thresholds.append(float(thres))

            c = cur[1:-1, 1:-1, 1:-1]
            passed = (c > thres) | (c < -thres)
            is_min = (
                (c < prv[1:-1, 1:-1, 1:-1])
                & (c < cur[1:-1, 1:-1, :-2])
                & (c < cur[1:-1, 1:-1, 2:])
                & (c < cur[1:-1, 2:, 1:-1])
                & (c < cur[1:-1, :-2, 1:-1])
                & (c < cur[2:, 1:-1, 1:-1])
                & (c < cur[:-2, 1:-1, 1:-1])
                & (c < nxt[1:-1, 1:-1, 1:-1])
            )
            is_max = (
                (c > prv[1:-1, 1:-1, 1:-1])
                & (c > cur[1:-1, 1:-1, :-2])
                & (c > cur[1:-1, 1:-1, 2:])
                & (c > cur[1:-1, 2:, 1:-1])
                & (c > cur[1:-1, :-2, 1:-1])
                & (c > cur[2:, 1:-1, 1:-1])
                & (c > cur[:-2, 1:-1, 1:-1])
                & (c > nxt[1:-1, 1:-1, 1:-1])
            )
            mask = passed & (is_min | is_max)
            zz, yy, xx = np.nonzero(mask)  # row-major: z, y, x ascending
            for z, y, x in zip(zz, yy, xx):
                extrema.append(
                    OracleKeypoint(
                        x=int(x) + IMG_BORDER,
                        y=int(y) + IMG_BORDER,
                        z=int(z) + IMG_BORDER,
                        octave=o,
                        level=i,
                        scale=dog[idx].scale,
                    )
                )
    return extrema, thresholds


# ---------------------------------------------------------------------------
# Stage 4: orientation (Assign_Orientation_Imp, Src/cSIFT3D.cc:913-1138)
# ---------------------------------------------------------------------------

def assign_orientation(kp: OracleKeypoint, level: Level, cfg: SiftConfig) -> int:
    gau = level.data
    nz, ny, nx = gau.shape
    u = F32(level.unit)
    sigma = F32(ORI_SIG_FCTR) * F32(kp.scale)
    win_radius = sigma * F32(ORI_RAD_FCTR)

    cx, cy, cz = F32(kp.x), F32(kp.y), F32(kp.z)

    def rng(c, n):
        start = int(math.floor(float(F32(c - win_radius / u))))
        start = start if start > 1 else IMG_BORDER
        end = int(math.ceil(float(F32(c + win_radius / u))))
        end = end if end < (n - 2) else n - 1 - IMG_BORDER
        return start, end

    x0, x1 = rng(cx, nx)
    y0, y1 = rng(cy, ny)
    z0, z1 = rng(cz, nz)

    if x1 < x0 or y1 < y0 or z1 < z0:
        win = np.zeros(3, dtype=F32)
        st = np.zeros((3, 3), dtype=F32)
    else:
        zs, ys, xs = np.meshgrid(
            np.arange(z0, z1 + 1), np.arange(y0, y1 + 1), np.arange(x0, x1 + 1),
            indexing="ij",
        )
        dx = (xs.astype(F32) - cx) * u
        dy = (ys.astype(F32) - cy) * u
        dz = (zs.astype(F32) - cz) * u
        sq = dx * dx + dy * dy + dz * dz
        inside = sq <= win_radius * win_radius

        w = np.exp(F32(-0.5) * sq / (sigma * sigma)).astype(F32)
        sub = gau[z0 - 1 : z1 + 2, y0 - 1 : y1 + 2, x0 - 1 : x1 + 2]
        gx = F32(0.5) * (sub[1:-1, 1:-1, 2:] - sub[1:-1, 1:-1, :-2]) / u
        gy = F32(0.5) * (sub[1:-1, 2:, 1:-1] - sub[1:-1, :-2, 1:-1]) / u
        gz = F32(0.5) * (sub[2:, 1:-1, 1:-1] - sub[:-2, 1:-1, 1:-1]) / u

        w = np.where(inside, w, F32(0.0))
        st = np.zeros((3, 3), dtype=F32)
        st[0, 0] = np.sum(gx * gx * w, dtype=F32)
        st[0, 1] = st[1, 0] = np.sum(gx * gy * w, dtype=F32)
        st[0, 2] = st[2, 0] = np.sum(gx * gz * w, dtype=F32)
        st[1, 1] = np.sum(gy * gy * w, dtype=F32)
        st[1, 2] = st[2, 1] = np.sum(gy * gz * w, dtype=F32)
        st[2, 2] = np.sum(gz * gz * w, dtype=F32)
        win = np.array(
            [np.sum(gx * w, dtype=F32), np.sum(gy * w, dtype=F32), np.sum(gz * w, dtype=F32)],
            dtype=F32,
        )

    kp.str_tensor = st

    # Reject weak mean gradient (Src/cSIFT3D.cc:1008)
    if float(np.dot(win, win)) < ORI_GRAD_THRESH:
        return -1

    # Eigendecomposition, ascending by eigenvalue (Src/cSIFT3D.cc:1027-1050).
    vals, vecs = np.linalg.eigh(st.astype(np.float64))
    order = np.argsort(vals, kind="stable")
    vals = vals[order].astype(F32)
    vecs = vecs[:, order].astype(F32)
    kp.eigvals = vals.copy()

    if (
        abs(float(vals[0]) / float(vals[1])) > cfg.max_eig_thres
        or abs(float(vals[1]) / float(vals[2])) > cfg.max_eig_thres
    ):
        return -2
    if (
        abs(float(vals[0]) - float(vals[1])) < DBL_EPSILON
        or abs(float(vals[0]) - float(vals[2])) < DBL_EPSILON
        or abs(float(vals[2]) - float(vals[1])) < DBL_EPSILON
    ):
        return -2

    # Sign assignment + corner score (Src/cSIFT3D.cc:1084-1113)
    d_norm = F32(math.sqrt(float(np.dot(win, win))))
    corner_score = np.inf
    sv = vecs.copy()
    for i in (2, 1):
        v = sv[:, i]
        d = F32(np.dot(v, win))
        q_norm = F32(math.sqrt(float(np.dot(v, v))))
        cos_ang = d / (d_norm * q_norm)
        corner_score = min(corner_score, abs(float(cos_ang)))
        sgn = F32(1.0) if d > 0.0 else F32(-1.0)
        sv[:, i] = v * sgn

    if corner_score < cfg.corner_thresh:
        return -3

    v1 = sv[:, 2]
    v2 = sv[:, 1]
    vr = np.cross(v1.astype(np.float64), v2.astype(np.float64)).astype(F32)
    # Rotation columns = [v1 v2 vr] (Src/cSIFT3D.cc:1127-1135)
    R = np.stack([v1, v2, vr], axis=1).astype(F32)
    kp.rotation = R
    return 1


# ---------------------------------------------------------------------------
# Stage 5: descriptor (Extract_Descriptor_Imp, Src/cSIFT3D.cc:1152-1381)
# ---------------------------------------------------------------------------

def _cart2bary_first_face(grads: np.ndarray):
    """Vectorised Check_intersect_faces (Src/cSIFT3D.cc:1542-1573):
    first face (in table order) whose Moller-Trumbore barycentric coords are
    all >= -bary_eps with k >= 0 and |det| >= bary_eps.

    grads: (..., 3). Returns (face_idx (...,) int32 [-1 if none],
    bary (..., 3) float32).
    """
    v0 = TRI_VERTS[:, 0, :]
    v1 = TRI_VERTS[:, 1, :]
    v2 = TRI_VERTS[:, 2, :]
    e1 = v1 - v0                     # (20, 3)
    e2 = v2 - v0
    t = -v0
    q = np.cross(t, e1)              # (20, 3)

    g = grads[..., None, :]          # (..., 1, 3)
    p = np.cross(g, e2[None, :, :])  # (..., 20, 3)
    det = np.sum(e1 * p, axis=-1)    # (..., 20)
    det_ok = np.abs(det) >= BARY_EPS
    det_inv = np.where(det_ok, 1.0 / np.where(det_ok, det, 1.0), 0.0)
    by = det_inv * np.sum(p * t[None, :, :], axis=-1)
    bz = det_inv * np.sum(g * q[None, :, :], axis=-1)
    bx = 1.0 - by - bz
    k = det_inv * np.sum(q * e2, axis=-1)  # (20,) face constant broadcast
    valid = (
        det_ok
        & (bx >= -BARY_EPS)
        & (by >= -BARY_EPS)
        & (bz >= -BARY_EPS)
        & (k >= 0)
    )
    # grad must be non-degenerate (Src/cSIFT3D.cc:1544)
    nondeg = np.sum(grads * grads, axis=-1) >= BARY_EPS
    valid = valid & nondeg[..., None]

    face_rank = np.where(valid, np.arange(ICOS_NFACES), ICOS_NFACES)
    first = np.min(face_rank, axis=-1)
    face_idx = np.where(first < ICOS_NFACES, first, -1).astype(np.int32)
    sel = np.clip(face_idx, 0, ICOS_NFACES - 1)
    bary = np.stack(
        [
            np.take_along_axis(bx, sel[..., None], axis=-1)[..., 0],
            np.take_along_axis(by, sel[..., None], axis=-1)[..., 0],
            np.take_along_axis(bz, sel[..., None], axis=-1)[..., 0],
        ],
        axis=-1,
    ).astype(F32)
    return face_idx, bary


def extract_descriptor(kp: OracleKeypoint, level: Level,
                       collect: dict | None = None) -> None:
    """collect (optional): a dict that receives the per-voxel internals
    (face_idx, bary, contrib, grad_rot) — used by tools/diagnose_desc_tail.py
    to attribute cross-build descriptor deltas to icosahedral face flips."""
    gau = level.data
    nz, ny, nx = gau.shape
    u = F32(level.unit)
    sigma = F32(kp.scale) * F32(DESC_SIG_FCTR)
    win_radius = F32(DESC_RAD_FCTR) * sigma
    desc_hw = win_radius / F32(math.sqrt(2))
    desc_width = F32(2.0) * desc_hw
    desc_bin_fctr = F32(NHIST_PER_DIM) / desc_width
    coord_factor = 2.0 ** kp.octave

    cx, cy, cz = F32(kp.x), F32(kp.y), F32(kp.z)

    def rng(c, n):
        start = int(math.floor(float(F32(c - win_radius / u))))
        start = start if start > 1 else IMG_BORDER
        end = int(math.ceil(float(F32(c + win_radius / u))))
        end = end if end < (n - 2) else n - 1 - IMG_BORDER
        return start, end

    x0, x1 = rng(cx, nx)
    y0, y1 = rng(cy, ny)
    z0, z1 = rng(cz, nz)

    desc = np.zeros(DESC_NUMEL, dtype=F32)

    if x1 >= x0 and y1 >= y0 and z1 >= z0:
        zs, ys, xs = np.meshgrid(
            np.arange(z0, z1 + 1), np.arange(y0, y1 + 1), np.arange(x0, x1 + 1),
            indexing="ij",
        )
        dx = (xs.astype(F32) - cx) * u
        dy = (ys.astype(F32) - cy) * u
        dz = (zs.astype(F32) - cz) * u
        sq = dx * dx + dy * dy + dz * dz
        in_sphere = sq <= win_radius * win_radius

        # Invert the rotation in place exactly like the reference
        # (Transpose_Matrix(kp.Rotation), Src/cSIFT3D.cc:1214): the stored
        # keypoint rotation is the descriptor-frame R^T from here on. The
        # C++ shares the non-idempotency hazard; unlike it, refuse a repeat
        # extraction instead of silently un-transposing.
        if kp.rotation_is_descriptor_frame:
            raise ValueError(
                "extract_descriptor called twice on the same OracleKeypoint:"
                " kp.rotation is already the descriptor-frame R^T"
            )
        kp.rotation = kp.rotation.T.astype(F32)
        kp.rotation_is_descriptor_frame = True
        Rt = kp.rotation
        disp = np.stack([dx, dy, dz], axis=-1)          # (..., 3)
        vrot = disp @ Rt.T                               # Rt @ disp per voxel
        vbins = (vrot + desc_hw) * desc_bin_fctr - F32(0.5)

        in_box = ~(
            (vbins[..., 0] <= -0.5) | (vbins[..., 1] <= -0.5) | (vbins[..., 2] <= -0.5)
            | (vbins[..., 0] >= 3.5) | (vbins[..., 1] >= 3.5) | (vbins[..., 2] >= 3.5)
        )
        contrib = in_sphere & in_box

        w = np.exp(F32(-0.5) * sq / (sigma * sigma)).astype(F32)
        sub = gau[z0 - 1 : z1 + 2, y0 - 1 : y1 + 2, x0 - 1 : x1 + 2]
        gx = F32(0.5) * (sub[1:-1, 1:-1, 2:] - sub[1:-1, 1:-1, :-2]) / u
        gy = F32(0.5) * (sub[1:-1, 2:, 1:-1] - sub[1:-1, :-2, 1:-1]) / u
        gz = F32(0.5) * (sub[2:, 1:-1, 1:-1] - sub[:-2, 1:-1, 1:-1]) / u
        grad = np.stack([gx, gy, gz], axis=-1) * w[..., None]
        grad_rot = grad @ Rt.T

        face_idx, bary = _cart2bary_first_face(grad_rot.astype(F32))
        contrib = contrib & (face_idx >= 0)
        if collect is not None:
            collect.update(face_idx=face_idx, bary=bary, contrib=contrib,
                           grad_rot=grad_rot.astype(F32))

        mag = np.sqrt(np.sum(grad_rot * grad_rot, axis=-1)).astype(F32)

        # Spatial binning: base bin = int(vbins) (trunc toward zero,
        # Src/cSIFT3D.cc:1417-1419) while the fraction uses floorf
        # (Src/cSIFT3D.cc:1398-1400). Replicated exactly.
        dvb = (vbins - np.floor(vbins)).astype(F32)
        base = vbins.astype(np.int32)  # trunc toward zero

        sel_face = np.clip(face_idx, 0, ICOS_NFACES - 1)
        vert_ids = TRI_IDX[sel_face]                     # (..., 3)

        flat_desc = desc
        for dxb in range(2):
            for dyb in range(2):
                for dzb in range(2):
                    bx = base[..., 0] + dxb
                    by = base[..., 1] + dyb
                    bz = base[..., 2] + dzb
                    ok = (
                        contrib
                        & (bx >= 0) & (by >= 0) & (bz >= 0)
                        & (bx < NHIST_PER_DIM) & (by < NHIST_PER_DIM) & (bz < NHIST_PER_DIM)
                    )
                    wx = np.where(dxb == 0, 1.0 - dvb[..., 0], dvb[..., 0])
                    wy = np.where(dyb == 0, 1.0 - dvb[..., 1], dvb[..., 1])
                    wz = np.where(dzb == 0, 1.0 - dvb[..., 2], dvb[..., 2])
                    wgt = (wx * wy * wz).astype(F32) * mag
                    hist = (bx + by * NHIST_PER_DIM + bz * NHIST_PER_DIM ** 2)
                    for c in range(3):
                        off = hist * 12 + vert_ids[..., c]
                        np.add.at(
                            flat_desc,
                            off[ok].ravel(),
                            (wgt * bary[..., c])[ok].ravel().astype(F32),
                        )

    # normalise -> truncate -> normalise (Src/cSIFT3D.cc:1350-1358)
    desc = _normalize_desc(desc)
    desc = np.minimum(desc, F32(0.2 * 128 / DESC_NUMEL))
    desc = _normalize_desc(desc)

    kp.desc = desc
    kp.rx = float(kp.x * coord_factor)
    kp.ry = float(kp.y * coord_factor)
    kp.rz = float(kp.z * coord_factor)


def _normalize_desc(desc: np.ndarray) -> np.ndarray:
    norm = math.sqrt(float(np.sum(desc.astype(np.float64) ** 2))) + DBL_EPSILON
    return (desc * F32(1.0 / norm)).astype(F32)


# ---------------------------------------------------------------------------
# Full pipeline (KpSiftAlgorithm, Src/cSIFT3D.cc:165-235)
# ---------------------------------------------------------------------------

def run_sift(volume: np.ndarray, cfg: SiftConfig | None = None) -> OracleResult:
    """volume: (nz, ny, nx) float32. Returns accepted keypoints + intermediates."""
    cfg = cfg or SiftConfig()
    vol = data_scale(np.ascontiguousarray(volume, dtype=F32))
    nz, ny, nx = vol.shape
    noct = cfg.num_octaves((nx, ny, nz))

    gss = build_gss(vol, cfg)
    dog = build_dog(gss, cfg, noct)
    extrema, thresholds = detect_keypoints(dog, cfg, noct)

    accepted: list[OracleKeypoint] = []
    for kp in extrema:
        lvl = gss[kp.octave * cfg.gss_levels + kp.level]
        kp.status = assign_orientation(kp, lvl, cfg)
        if kp.status == 1:
            accepted.append(kp)

    for kp in accepted:
        lvl = gss[kp.octave * cfg.gss_levels + kp.level]
        extract_descriptor(kp, lvl)

    return OracleResult(
        keypoints=accepted,
        all_extrema=extrema,
        gss=gss,
        dog=dog,
        dog_thresholds=thresholds,
    )
