"""Pallas TPU kernel for descriptor binning — the #2 hot loop.

The XLA formulation of the per-voxel descriptor math (ops/descriptor.py)
materialises ~60 intermediates per window voxel to HBM (measured 552ms
device time for 412 keypoints at 128^3 level (0,1)); this kernel keeps the
whole per-voxel chain in VMEM and performs the 768-bin accumulation as an
in-kernel MXU contraction

    desc[16, 48] += G(16, LANE) @ H(48, LANE)^T        per sublane row,

with G rows the 16 (x, y) spatial-bin weights and H rows the 48 (z, vertex)
weights, voxels on lanes.

Kernel v2 optimisations over the straightforward port:
- face selection: for a regular icosahedron the face pierced by a ray is
  the argmax of dot(gradient, face normal) (face cones are the spherical
  Voronoi cells of the normals; verified to agree 100% with the reference's
  first-hit Moller-Trumbore loop, Src/cSIFT3D.cc:1542-1573, over 2e5 random
  directions). That replaces 20 unrolled ray-triangle tests (~500 VPU
  ops/voxel) with 20 dot-rows + one constant-table select via a single
  (16, 20) @ (20, LANE) MXU product, then ONE Moller-Trumbore evaluation.
- bin-matrix build: G and H come from per-axis weight strips expanded with
  constant (16,4)/(48,4)/(48,12) one-hot matrices on the MXU instead of
  dense iota compares on (48, LANE) tensors.

Numerics: identical math modulo fp op order and eps-measure face ties
(validated against the XLA path and the CPU oracle; descriptor parity
budget is L2 < 1e-3).

Grid: (B keypoints, T voxel tiles); each tile is (SUB, LANE) voxels.
Per-tile integer coordinate maps are precomputed on host (shared by every
keypoint of a level) so the kernel does no div/mod.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import BARY_EPS
from ...geometry import MESH_CONST, TRI_IDX, TRI_VERTS

SUB = 8       # sublane rows per tile
LANE = 2048   # lanes per tile (wide rows amortise the per-sublane pass)
TILE = SUB * LANE


def _face_constants():
    """Stacked per-face constant table C (16, 20): rows
    [e1(3); e2(3); t(3); q(3); qe2(1); vid(3); pad to 17 even] and the
    outward unit normals N (20, 3)."""
    e1 = MESH_CONST["e1"].astype(np.float32)
    e2 = MESH_CONST["e2"].astype(np.float32)
    t = MESH_CONST["t"].astype(np.float32)
    q = MESH_CONST["q"].astype(np.float32)
    qe2 = np.sum(q * e2, axis=-1, keepdims=True).astype(np.float32)
    vid = TRI_IDX.astype(np.float32)

    v0, v1, v2 = TRI_VERTS[:, 0], TRI_VERTS[:, 1], TRI_VERTS[:, 2]
    n = np.cross(v1 - v0, v2 - v0)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    centers = (v0 + v1 + v2) / 3.0
    n[np.sum(n * centers, axis=1) < 0] *= -1

    C = np.concatenate([e1, e2, t, q, qe2, vid], axis=1).T  # (16, 20)
    return C.astype(np.float32), n.astype(np.float32)


_CTAB, _NORMALS = _face_constants()

# one-hot expansion matrices for the bin builds
_EX = np.zeros((16, 4), np.float32)
_EY = np.zeros((16, 4), np.float32)
for _g in range(16):
    _EX[_g, _g // 4] = 1.0
    _EY[_g, _g % 4] = 1.0
_EZ = np.zeros((48, 4), np.float32)
_EV = np.zeros((48, 12), np.float32)
for _h in range(48):
    _EZ[_h, _h // 12] = 1.0
    _EV[_h, _h % 12] = 1.0


def _kernel(
    kpi_ref,   # scalar-prefetch: (B, 12) int32 [sz sy sx cx cy cz xlo xhi ylo yhi zlo zhi]
    kpok_ref,  # scalar-prefetch: (B,) int32 accepted flag
    rot_ref,   # scalar-prefetch: (B, 16) f32: R^T row-major (9 used)
    gx_ref, gy_ref, gz_ref,          # (1, 1, SUB, LANE) f32 gradient tiles
    jz_ref, jy_ref, jx_ref,          # (1, SUB, LANE) int32 core-offset maps
    ctab_ref, ex_ref, ey_ref, ez_ref, ev_ref,  # constant tables (VMEM)
    out_ref,                         # (1, 16, 48) f32 accumulator
    *,
    unit: float,
    win_radius: float,
    sigma: float,
    desc_hw: float,
    desc_bin_fctr: float,
):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[0] = jnp.zeros((16, 48), jnp.float32)

    f32 = jnp.float32
    u = f32(unit)
    r2 = f32(win_radius) * f32(win_radius)
    sigma2 = f32(sigma) * f32(sigma)

    sz = kpi_ref[b, 0]
    sy = kpi_ref[b, 1]
    sx = kpi_ref[b, 2]
    cx = kpi_ref[b, 3]
    cy = kpi_ref[b, 4]
    cz = kpi_ref[b, 5]
    xlo = kpi_ref[b, 6]
    xhi = kpi_ref[b, 7]
    ylo = kpi_ref[b, 8]
    yhi = kpi_ref[b, 9]
    zlo = kpi_ref[b, 10]
    zhi = kpi_ref[b, 11]
    ok = kpok_ref[b]

    az = jz_ref[0] + sz            # (SUB, LANE) int32
    ay = jy_ref[0] + sy
    ax = jx_ref[0] + sx

    in_box = (
        (ax >= xlo) & (ax <= xhi)
        & (ay >= ylo) & (ay <= yhi)
        & (az >= zlo) & (az <= zhi)
        & (ok > 0)
    )

    dx = (ax.astype(f32) - cx.astype(f32)) * u
    dy = (ay.astype(f32) - cy.astype(f32)) * u
    dz = (az.astype(f32) - cz.astype(f32)) * u
    sq = dx * dx + dy * dy + dz * dz
    inside = in_box & (sq <= r2)

    R = [rot_ref[b, k] for k in range(9)]  # R^T row-major

    vrx = R[0] * dx + R[1] * dy + R[2] * dz
    vry = R[3] * dx + R[4] * dy + R[5] * dz
    vrz = R[6] * dx + R[7] * dy + R[8] * dz

    vbx = (vrx + f32(desc_hw)) * f32(desc_bin_fctr) - f32(0.5)
    vby = (vry + f32(desc_hw)) * f32(desc_bin_fctr) - f32(0.5)
    vbz = (vrz + f32(desc_hw)) * f32(desc_bin_fctr) - f32(0.5)
    bins_ok = (
        (vbx > -0.5) & (vbx < 3.5)
        & (vby > -0.5) & (vby < 3.5)
        & (vbz > -0.5) & (vbz < 3.5)
    )

    w = jnp.exp(f32(-0.5) * sq / sigma2)
    gvx = gx_ref[0, 0] * w
    gvy = gy_ref[0, 0] * w
    gvz = gz_ref[0, 0] * w

    grx = R[0] * gvx + R[1] * gvy + R[2] * gvz
    gry = R[3] * gvx + R[4] * gvy + R[5] * gvz
    grz = R[6] * gvx + R[7] * gvy + R[8] * gvz

    g2 = grx * grx + gry * gry + grz * grz
    nondeg = g2 >= f32(BARY_EPS)
    mag = jnp.sqrt(g2)

    valmask = jnp.where(inside & bins_ok & nondeg, mag, f32(0.0))

    basex = vbx.astype(jnp.int32)
    basey = vby.astype(jnp.int32)
    basez = vbz.astype(jnp.int32)
    fracx = vbx - jnp.floor(vbx)
    fracy = vby - jnp.floor(vby)
    fracz = vbz - jnp.floor(vbz)

    Ctab = ctab_ref[:]              # (16, 20)
    EX = ex_ref[:]
    EY = ey_ref[:]
    EZ = ez_ref[:]
    EV = ev_ref[:]
    N = _NORMALS                    # numpy (20, 3): rows become immediates

    iota4 = jax.lax.broadcasted_iota(jnp.int32, (4, LANE), 0)
    iota12f = jax.lax.broadcasted_iota(jnp.int32, (12, LANE), 0).astype(f32)
    iota20 = jax.lax.broadcasted_iota(jnp.int32, (20, LANE), 0)

    hi_prec = jax.lax.Precision.HIGHEST
    dot_kw = dict(preferred_element_type=jnp.float32, precision=hi_prec)

    acc = jnp.zeros((16, 48), jnp.float32)
    for s in range(SUB):
        def row(a):
            return a[s : s + 1, :]  # (1, LANE)

        gxs, gys, gzs = row(grx), row(gry), row(grz)

        # --- face via argmax over outward normals -------------------------
        D = jnp.concatenate(
            [f32(N[i, 0]) * gxs + f32(N[i, 1]) * gys + f32(N[i, 2]) * gzs
             for i in range(20)],
            axis=0,
        )  # (20, LANE)
        best = jnp.max(D, axis=0, keepdims=True)
        hit = D == best
        first = jnp.min(jnp.where(hit, iota20, 99), axis=0, keepdims=True)
        onehot = (iota20 == first).astype(f32)  # (20, LANE), exactly one bit

        C = jax.lax.dot_general(Ctab, onehot, (((1,), (0,)), ((), ())), **dot_kw)
        # rows: 0-2 e1, 3-5 e2, 6-8 t, 9-11 q, 12 qe2, 13-15 vid
        E1x, E1y, E1z = C[0:1], C[1:2], C[2:3]
        E2x, E2y, E2z = C[3:4], C[4:5], C[5:6]
        Tx, Ty, Tz = C[6:7], C[7:8], C[8:9]
        Qx, Qy, Qz = C[9:10], C[10:11], C[11:12]
        QE2 = C[12:13]
        vid0, vid1, vid2 = C[13:14], C[14:15], C[15:16]

        px = gys * E2z - gzs * E2y
        py = gzs * E2x - gxs * E2z
        pz = gxs * E2y - gys * E2x
        det = E1x * px + E1y * py + E1z * pz
        det_ok = jnp.abs(det) >= f32(BARY_EPS)
        det_inv = f32(1.0) / jnp.where(det_ok, det, f32(1.0))
        byv = det_inv * (px * Tx + py * Ty + pz * Tz)
        bzv = det_inv * (gxs * Qx + gys * Qy + gzs * Qz)
        bxv = f32(1.0) - byv - bzv
        kv = det_inv * QE2
        okf = (
            det_ok
            & (bxv >= f32(-BARY_EPS)) & (byv >= f32(-BARY_EPS))
            & (bzv >= f32(-BARY_EPS)) & (kv >= 0)
        )
        val = jnp.where(okf, row(valmask), f32(0.0))  # (1, LANE)

        # --- bin strips ---------------------------------------------------
        bxs, bys, bzs = row(basex), row(basey), row(basez)
        fxs, fys, fzs = row(fracx), row(fracy), row(fracz)
        Wx = (
            (iota4 == bxs).astype(f32) * (f32(1.0) - fxs)
            + (iota4 == bxs + 1).astype(f32) * fxs
        )
        Wy = (
            (iota4 == bys).astype(f32) * (f32(1.0) - fys)
            + (iota4 == bys + 1).astype(f32) * fys
        )
        Wz = (
            (iota4 == bzs).astype(f32) * (f32(1.0) - fzs)
            + (iota4 == bzs + 1).astype(f32) * fzs
        )
        V12 = (
            (iota12f == vid0).astype(f32) * (bxv * val)
            + (iota12f == vid1).astype(f32) * (byv * val)
            + (iota12f == vid2).astype(f32) * (bzv * val)
        )  # (12, LANE)

        G = (
            jax.lax.dot_general(EX, Wx, (((1,), (0,)), ((), ())), **dot_kw)
            * jax.lax.dot_general(EY, Wy, (((1,), (0,)), ((), ())), **dot_kw)
        )  # (16, LANE)
        H = (
            jax.lax.dot_general(EZ, Wz, (((1,), (0,)), ((), ())), **dot_kw)
            * jax.lax.dot_general(EV, V12, (((1,), (0,)), ((), ())), **dot_kw)
        )  # (48, LANE)

        acc = acc + jax.lax.dot_general(
            G, H, (((1,), (1,)), ((), ())), **dot_kw
        )

    out_ref[0] = out_ref[0] + acc


@functools.partial(
    jax.jit,
    static_argnames=("consts", "interpret"),
)
def descriptor_bins_pallas(
    gx, gy, gz,          # (B, C) f32 gradients (C padded to TILE multiple)
    jzm, jym, jxm,       # (C,) int32 core-offset maps
    kpi,                 # (B, 12) int32 per-kp ints
    kpok,                # (B,) int32
    rotT,                # (B, 16) f32 (R^T row-major, padded)
    consts,              # (unit, win_radius, sigma, desc_hw, desc_bin_fctr)
    interpret: bool = False,
):
    """Returns (B, 16, 48) descriptor accumulators (xy-major, zv-minor)."""
    B, C = gx.shape
    assert C % TILE == 0
    nt = C // TILE
    unit, win_radius, sigma, desc_hw, desc_bin_fctr = consts

    kernel = functools.partial(
        _kernel,
        unit=unit,
        win_radius=win_radius,
        sigma=sigma,
        desc_hw=desc_hw,
        desc_bin_fctr=desc_bin_fctr,
    )

    # index maps receive the scalar-prefetch refs as trailing args
    def g_spec():
        return pl.BlockSpec(
            (1, 1, SUB, LANE), lambda b, t, *_: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def j_spec():
        return pl.BlockSpec(
            (1, SUB, LANE), lambda b, t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nt),
        in_specs=[
            g_spec(), g_spec(), g_spec(),
            j_spec(), j_spec(), j_spec(),
        ] + [
            pl.BlockSpec(shape, lambda b, t, *_: (0,) * len(shape),
                         memory_space=pltpu.VMEM)
            for shape in ((16, 20), (16, 4), (16, 4), (48, 4), (48, 12))
        ],
        out_specs=pl.BlockSpec(
            (1, 16, 48), lambda b, t, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    shape4 = (B, nt, SUB, LANE)
    shape3 = (nt, SUB, LANE)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 16, 48), jnp.float32),
        interpret=interpret,
    )(
        kpi, kpok, rotT,
        gx.reshape(shape4), gy.reshape(shape4), gz.reshape(shape4),
        jzm.reshape(shape3), jym.reshape(shape3), jxm.reshape(shape3),
        jnp.asarray(_CTAB), jnp.asarray(_EX), jnp.asarray(_EY),
        jnp.asarray(_EZ), jnp.asarray(_EV),
    )
