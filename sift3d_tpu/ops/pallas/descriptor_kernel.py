"""Pallas TPU kernel for descriptor binning — the #2 hot loop.

The XLA formulation of the per-voxel descriptor math (ops/descriptor.py)
materialises ~60 intermediates per window voxel to HBM (measured 552ms
device time for 412 keypoints at 128^3 level (0,1)); this kernel keeps the
whole per-voxel chain — central-difference gradients, displacement, masks,
Gaussian weight, eigenframe rotation, icosahedral face select, barycentric
vertex weights, trilinear bin weights — in VMEM registers, and performs the
768-bin accumulation as an in-kernel MXU contraction:

    desc[16, 48] += G(16, LANES) @ H(48, LANES)^T        per sublane row,

where G rows are the 16 (x, y) spatial-bin weights and H rows the 48 (z,
vertex) weights, voxels on lanes.

v5 (fused gradients): the kernel input is the RAW gathered window values,
flattened (window-major) — one whole-window VMEM block per keypoint, reused
across that keypoint's voxel tiles. Central differences are computed
in-kernel from flat-shifted copies (sublane/lane rolls with a row-carry
select), so the XLA stage no longer materialises three (B, C) gradient
streams to HBM: per-keypoint traffic drops from ~14 MB to ~5 MB at the
77^3 window (the gather+gradient stage was ~160 ms of the 256^3 pair).
Window-edge positions have no valid central difference and are excluded by
sentinel offset maps exactly like pad lanes.

v4: det and q·e2 are argmax-degenerate on the icosahedron (det = C·best
with one global scalar, q·e2 constant — geometry.argmax_face_constants), so
the face-select loop carries only the C-folded by/bz vectors and one packed
vid+sign int: 12 vector ops per face instead of 18.

v3: face select is argmax over the 20 outward face normals with fused
constant selection (the equivalence the independent CPU baseline uses,
native/cpu_baseline.cc:454-485, in place of the reference's 20-way
first-hit loop, Src/cSIFT3D.cc:1542-1573; they agree except within
BARY_EPS of a face edge). G/H built as Kronecker factors; whole grid steps
skipped when a tile's z-slab cannot contribute.

Numerics match ops/descriptor.py except where float op order differs
(covered by the oracle parity tolerance); semantics replicated are those of
Extract_Descriptor_Imp (reference Src/cSIFT3D.cc:1152-1573) — see
ops/descriptor.py for the full catalogue of quirks.

Grid: (B keypoints, T voxel tiles); each tile is (SUB, LANE) window
positions. Per-tile integer offset maps are precomputed on host (shared by
every keypoint of a level) so the kernel does no div/mod.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import BARY_EPS
from ...geometry import ARGMAX_CONST

# Tile shape (SUB sublane rows x LANE lanes, TILE = SUB*LANE voxels).
# The per-voxel chain is shape-agnostic and the flat voxel order is
# row-major either way, so the in-kernel gradient shifts work for any
# (SUB, LANE) with LANE % 128 == 0 and SUB % 8 == 0. Measured on TPU v5e
# (256^3 pair): (64, 512) 0.717 s vs (8, 4096) 0.776 s — the VPU/MXU work
# is identical (only loop trip counts change), and the wide tiles pay more
# in lane-dim shifts, so tall-thin stays the default. A/B via env var
# (read at import, like ACCUM_GROUP below).
import os as _os

SUB, LANE = (
    int(v) for v in _os.environ.get("SIFT3D_DESC_TILE", "64x512").split("x")
)
TILE = SUB * LANE
# Kronecker-factor accumulation granularity: rows per G/H build+dot.
# >1 builds (4|12, GROUP, LANE) factors (full VREG packing); 1 = the
# per-sublane-row variant. Must divide SUB. Measured on TPU v5e (256^3
# pair, EVIDENCE_r2.json ab_accum): GROUP=1 0.717 s vs GROUP=8 1.005 s —
# the grouped build's (4|12, GR, LANE) concats relayout more than the
# packed VREGs save, so per-row is the default. A/B via env var (read at
# import; the kernel wrapper is jit-cached, so flipping the module global
# mid-process does not retrace — set the env before import or call
# jax.clear_caches()).
ACCUM_GROUP = int(_os.environ.get("SIFT3D_ACCUM_GROUP", "1"))

# Accumulation-dot precision: "highest" = f32 (6 bf16 MXU passes),
# "3pass" = manual a@b ~= ah@bh + ah@bl + al@bh split (drops only the
# ll term; with bf16's 8 mantissa bits each residual is ~2^-8 of its
# operand, so the dropped product is ~2^-16 relative, plus ~2^-16 from
# rounding the residuals themselves to bf16 — still well inside the 1e-3
# descriptor parity bar), "1pass" = plain bf16 (fails parity, diagnostic
# only). Default 3pass: the TPU v5e A/B (benchmarks/ab_knobs.py, 256^3
# pair) measured 0.728 s -> 0.695 s with identical keypoint AND match sets
# and max descriptor delta 3.3e-7 (EVIDENCE_r3 ab_accum_3pass).
ACCUM_PRECISION = _os.environ.get("SIFT3D_ACCUM_PRECISION", "3pass")

# Validate the documented env-knob constraints at import so a bad value
# fails here, not deep inside Mosaic lowering (or worse: silently skipping
# rows via SUB // ACCUM_GROUP truncation).
assert LANE % 128 == 0, f"SIFT3D_DESC_TILE LANE must be a multiple of 128, got {LANE}"
assert SUB % 8 == 0, f"SIFT3D_DESC_TILE SUB must be a multiple of 8, got {SUB}"
assert SUB % ACCUM_GROUP == 0, (
    f"SIFT3D_ACCUM_GROUP ({ACCUM_GROUP}) must divide SUB ({SUB})")
assert ACCUM_PRECISION in ("highest", "3pass", "1pass"), ACCUM_PRECISION


def _check_face_select(v: str) -> str:
    assert v in ("ndot", "shared", "anti", "sym"), v
    if v == "sym":
        from ...geometry import SYM_CONST

        assert SYM_CONST is not None, (
            "FACE_SELECT=sym requires the bitwise sign-symmetry "
            "decomposition to hold (geometry.sym_face_constants)")
    return v

# Sphere-sparse kernel (v7): per-8-row-subchunk scalar liveness tests
# against the keypoint sphere + per-keypoint gradient scratch (see
# _kernel_sparse). Exact-conservative: results bit-identical to the dense
# kernel. ADOPTED AS DEFAULT (r5): parity-gated TPU A/B at 256^3
# (EVIDENCE_r5 ab_desc_sparse) measured 0.587 -> 0.565 s on top of sym
# with identical keypoint/match sets and bit-identical descriptors vs the
# dense kernel. Skip granularity is the 8-row subchunk (8*LANE voxels);
# finer lanes capture more of the sphere's dead corners (live fraction
# 0.936 at LANE=512 -> 0.854 at 128) but narrow vectors cost more than
# the skip saves: 64x512 0.565 s, 8x512 0.576, 64x256 0.613, 64x128
# 0.646. A/B knob, read at import.
SPHERE_SKIP = _os.environ.get("SIFT3D_DESC_SPHERE", "1") == "1"

# Skip the Kronecker build + accumulation dot for sublane rows whose val
# vector is entirely zero (exact; ~25% of rows fail the sphere test alone).
# Measured on TPU v5e (256^3 pair, EVIDENCE_r3 ab_row_skip): 1.00 s vs
# 0.70 s — the 64 per-row lax.conds cost far more in scalar branching and
# broken instruction pipelining than the skipped VPU work saves, so the
# knob stays OFF. (Lesson: Mosaic control flow at sub-tile granularity is
# not worth it; skip at grid-step granularity or not at all.)
ROW_SKIP = _os.environ.get("SIFT3D_ROW_SKIP", "0") == "1"


def _accum_dot(G, H):
    """acc contribution: G (16, L) @ H (48, L)^T at ACCUM_PRECISION."""
    dims = (((1,), (1,)), ((), ()))
    if ACCUM_PRECISION == "highest":
        return jax.lax.dot_general(
            G, H, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if ACCUM_PRECISION == "3pass":
        gh = G.astype(jnp.bfloat16)
        hh = H.astype(jnp.bfloat16)
        gl = (G - gh.astype(jnp.float32)).astype(jnp.bfloat16)
        hl = (H - hh.astype(jnp.float32)).astype(jnp.bfloat16)

        def mm(x, y):
            return jax.lax.dot_general(
                x, y, dims, preferred_element_type=jnp.float32)

        return mm(gh, hl) + mm(gl, hh) + mm(gh, hh)
    return jax.lax.dot_general(
        G.astype(jnp.bfloat16), H.astype(jnp.bfloat16), dims,
        preferred_element_type=jnp.float32,
    )

# Face-select dot products on the MXU: hoist the 20 per-face ndots into one
# (20, 3) @ (3, SUB*LANE) matmul (trades 20x5 VPU ops for 4 relayout
# reshapes + one tiny-K matmul). Constant selection stays in the fold loop
# (exact first-wins tie semantics). A/B knob; 0 = all-VPU loop. Measured on
# TPU v5e (256^3 pair, EVIDENCE_r3 ab_face_mxu): 0.80 s vs 0.728 s AND a
# parity failure (desc delta 1.6e-2 — matmul rounding flips face-edge
# voxels), so the VPU loop stays the default.
FACE_MXU = _os.environ.get("SIFT3D_FACE_MXU", "0") == "1"

# Face-dot formulation: "ndot" = 20 independent 3-term dot products;
# "shared" exploits the icosahedral normals' structure — each axis
# component is one of only 3 magnitudes {0.3568, 0.5774, 0.9342}, so the 9
# products m*g_axis are computed once and each face dot becomes 1-2 adds
# (8 corner faces have 3 nonzero terms, 12 faces have 2). Term order and
# signed-zero handling match the ndot left-to-right order exactly, so the
# result is bit-identical unless the compiler was contracting the ndot
# mul+add chains into FMAs (the parity-gated A/B decides).
# "anti" exploits the icosahedron's central symmetry: the 20 outward
# normals form 10 exact bitwise +- pairs (verified at import), so the
# second member's dot is one exact negation instead of a 3-mul/2-add dot.
# Fold order stays 0..19, so selection is identical except on exact-tie
# inputs (measure-zero; covered by the parity-gated A/B).
# "sym" collapses the whole 20-face fold via the icosahedron's sign
# symmetry (geometry.sym_face_constants, verified bitwise at import): the
# argmax becomes 4 group maxima on |g| + a (group, signbits) table decode,
# and by/bz come from 3 candidate dots role-selected per face — every
# surviving value bitwise equal to the ndot fold away from exact-tie
# inputs (g components that are exactly +-0, or cross-group float ties;
# within-group zero-component ties resolve to the same earlier face as the
# 0..19 fold for 11 of 12 twin pairs). ~130 VPU ops/voxel replace ~250.
# ADOPTED AS DEFAULT (r5): parity-gated A/B on TPU v5e at 256^3
# (EVIDENCE_r5 ab_face_sym): 0.611 -> 0.587 s, identical keypoint AND
# match sets, desc tail 4/7639 over 1e-3 (worst 1.9e-3, within the
# amended face-edge bar). The modest wall gain vs the ~2x op-count cut
# says the kernel is no longer purely op-throughput-bound.
FACE_SELECT = _check_face_select(
    _os.environ.get("SIFT3D_FACE_SELECT", "sym"))

SENTINEL = 1 << 20  # offset-map value for positions with no contribution


def _shift_rows(ext, k: int):
    """out[r, l] = ext[flat(r*LANE + l + k)] for the rows that matter.

    Valid for output rows r with 0 <= r + floor(k/LANE) (+1) < ext rows;
    callers slice the middle band. 2-3 rolls + one lane select."""
    q, rml = divmod(k, LANE)
    nrow = ext.shape[0]

    def rroll(x, r):  # row roll by -r (pltpu.roll wants shift >= 0)
        return pltpu.roll(x, (-r) % nrow, 0)

    if rml == 0:
        return rroll(ext, q)
    a = pltpu.roll(ext, (LANE - rml) % LANE, 1)
    a1 = rroll(a, q)
    a2 = rroll(a, q + 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, ext.shape, 1)
    return jnp.where(lane < LANE - rml, a1, a2)


def _kernel(
    kpi_ref,   # scalar-prefetch: (B, 12) int32 [sz sy sx cx cy cz xlo xhi ylo yhi zlo zhi]
    kpok_ref,  # scalar-prefetch: (B,) int32 accepted flag
    rot_ref,   # scalar-prefetch: (B, 16) f32: R^T row-major (9 used)
    ztab_ref,  # scalar-prefetch: (nt, 2) int32 per-tile [zmin zmax] core offsets
    win_ref,                         # (1, R + 2*EXTR, LANE) f32 window values
    nrm_ref,                         # (20, 3) f32 outward face normals
    jz_ref, jy_ref, jx_ref,          # (1, SUB, LANE) int32 offset maps
    out_ref,                         # (1, 16, 48) f32 accumulator
    *,
    nt: int,
    rz: int,
    extr: int,
    wx: int,
    wxy: int,
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

    # per-keypoint scalars
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

    # Skip the whole grid step when this tile's z-slab cannot contribute:
    # outside the clamped box z-range, outside the sphere's z-extent
    # (|az - cz| <= ceil(r_vox), conservative), or an unaccepted lane.
    z_lo_eff = jnp.maximum(zlo, cz - rz)
    z_hi_eff = jnp.minimum(zhi, cz + rz)
    live = (
        (ok > 0)
        & (ztab_ref[t, 0] + sz <= z_hi_eff)
        & (ztab_ref[t, 1] + sz >= z_lo_eff)
    )

    @pl.when(live)
    def _body():
        u = f32(unit)
        r2 = f32(win_radius) * f32(win_radius)
        sigma2 = f32(sigma) * f32(sigma)
        inv_u = f32(1.0) / u

        # --- central differences from the in-VMEM window ------------------
        # ext covers the tile's rows plus the +-extr row reach of the z
        # shift; the window block is zero-padded with extr rows both ends.
        row0 = pl.multiple_of(t * SUB, SUB)
        ext = win_ref[0, pl.ds(row0, SUB + 2 * extr), :]

        def grad(k):
            vp = _shift_rows(ext, k)[extr: extr + SUB, :]
            vm = _shift_rows(ext, -k)[extr: extr + SUB, :]
            # exact op order of ops/windows.py central_gradients
            return f32(0.5) * (vp - vm) * inv_u

        gx0 = grad(1)
        gy0 = grad(wx)
        gz0 = grad(wxy)

        # absolute voxel coordinates of this tile
        az = jz_ref[0] + sz            # (SUB, LANE) int32
        ay = jy_ref[0] + sy
        ax = jx_ref[0] + sx

        R = [rot_ref[b, k] for k in range(9)]  # R^T row-major
        acc = _chain_acc(
            jnp.zeros((16, 48), jnp.float32),
            gx0, gy0, gz0, az, ay, ax, R,
            (cx, cy, cz, xlo, xhi, ylo, yhi, zlo, zhi),
            nrm_ref, u=u, r2=r2, sigma2=sigma2,
            desc_hw=desc_hw, desc_bin_fctr=desc_bin_fctr,
        )
        out_ref[0] = out_ref[0] + acc


def _chain_acc(
    acc,                 # (16, 48) f32 carry-in accumulator
    gx0, gy0, gz0,       # (ROWS, LANE) f32 central-difference gradients
    az, ay, ax,          # (ROWS, LANE) int32 absolute voxel coords
    R,                   # 9 scalar f32: R^T row-major
    bounds,              # 9 scalar int32: cx cy cz xlo xhi ylo yhi zlo zhi
    nrm_ref,             # (20, 3) f32 normals (FACE_MXU only)
    *,
    u, r2, sigma2, desc_hw: float, desc_bin_fctr: float,
):
    """Per-voxel descriptor chain + binning accumulation for one
    (ROWS, LANE) slab of window voxels: displacement/sphere/box/bin masks,
    Gaussian weight, eigenframe rotation, icosahedral face select,
    barycentric + trilinear weights, and the (16, 48) MXU accumulation.
    Shared by the dense per-tile kernel and the sphere-sparse subchunk
    kernel (v7). `acc` is a carry-in: row contributions fold into it
    left-to-right, so the sparse kernel's skipped subchunks (whose rows
    would contribute exact zeros) leave results bit-identical to the
    dense kernel."""
    f32 = jnp.float32
    rows = az.shape[0]
    (cx, cy, cz, xlo, xhi, ylo, yhi, zlo, zhi) = bounds

    if True:  # keep the historical indentation of the moved body
        in_box = (
            (ax >= xlo) & (ax <= xhi)
            & (ay >= ylo) & (ay <= yhi)
            & (az >= zlo) & (az <= zhi)
        )

        dx = (ax.astype(f32) - cx.astype(f32)) * u
        dy = (ay.astype(f32) - cy.astype(f32)) * u
        dz = (az.astype(f32) - cz.astype(f32)) * u
        sq = dx * dx + dy * dy + dz * dz
        inside = in_box & (sq <= r2)

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
        gvx = gx0 * w
        gvy = gy0 * w
        gvz = gz0 * w

        grx = R[0] * gvx + R[1] * gvy + R[2] * gvz
        gry = R[3] * gvx + R[4] * gvy + R[5] * gvz
        grz = R[6] * gvx + R[7] * gvy + R[8] * gvz

        g2 = grx * grx + gry * gry + grz * grz
        nondeg = g2 >= f32(BARY_EPS)

        # --- argmax-normal face select with fused constant selection -----
        NRM = ARGMAX_CONST["normals"]
        CBN = ARGMAX_CONST["c_by_n"]
        CQN = ARGMAX_CONST["c_bz_n"]
        VPK = ARGMAX_CONST["vid_pack"]
        # |det| >= BARY_EPS  ⟺  |best| >= BARY_EPS / C
        best_eps = f32(float(np.float64(BARY_EPS) / np.float64(ARGMAX_CONST["c_scale"])))

        if FACE_SELECT == "sym":
            # Sign-symmetry collapse of the 20-face fold (geometry.
            # sym_face_constants; bitwise-verified decomposition). Group
            # maxima reproduce the winning face's ndot value exactly:
            # products commute with sign flips and the zero-component
            # +-0 add is a no-op, so best / by_ / bz_ match the ndot fold
            # bit for bit away from exact ties.
            from ...geometry import SYM_CONST

            COEF = SYM_CONST["coef"]
            CAND = SYM_CONST["cands"]
            ENT = SYM_CONST["entry"]
            axx = jnp.abs(grx)
            axy = jnp.abs(gry)
            axz = jnp.abs(grz)
            m0 = f32(COEF[0, 0]) * axx + f32(COEF[0, 2]) * axz
            m1 = (f32(COEF[1, 0]) * axx + f32(COEF[1, 1]) * axy) \
                + f32(COEF[1, 2]) * axz
            m2 = f32(COEF[2, 1]) * axy + f32(COEF[2, 2]) * axz
            m3 = f32(COEF[3, 0]) * axx + f32(COEF[3, 1]) * axy
            best = m0
            gid = jnp.zeros_like(az)
            for i, m in ((1, m1), (2, m2), (3, m3)):
                upd = m > best  # strict: earlier group wins ties
                best = jnp.where(upd, m, best)
                gid = jnp.where(upd, i, gid)
            i32t = jnp.int32
            sb = (
                (grx < f32(0.0)).astype(i32t) * 4
                + (gry < f32(0.0)).astype(i32t) * 2
                + (grz < f32(0.0)).astype(i32t)
            )
            is1 = gid == 1
            is2 = gid == 2
            is3 = gid == 3

            def gsel(v0, v1, v2, v3):
                return jnp.where(
                    is1, v1, jnp.where(is2, v2, jnp.where(is3, v3, v0)))

            # h: |g| on sign-aligned components, raw g on the group's
            # zero-normal component (its sign pattern is always +1)
            hx = jnp.where(is2, grx, axx)
            hy = jnp.where(gid == 0, gry, axy)
            hz = jnp.where(is3, grz, axz)
            D = []
            for r in range(3):
                Xk = [
                    gsel(*(f32(float(CAND[m, r, k])) for m in range(4)))
                    for k in range(3)
                ]
                D.append((Xk[0] * hx + Xk[1] * hy) + Xk[2] * hz)

            def esel(m):
                e = ENT[m]
                r = jnp.full_like(sb, int(e[0]))
                for k in range(1, 8):
                    r = jnp.where(sb == k, int(e[k]), r)
                return r

            E = gsel(esel(0), esel(1), esel(2), esel(3))
            vid0 = E & 15
            vid1 = (E >> 4) & 15
            vid2 = (E >> 8) & 15
            rb = (E >> 12) & 3
            rq = E >> 14
            by_num = jnp.where(rb == 1, D[1], jnp.where(rb == 2, D[2], D[0]))
            bz_num = jnp.where(rq == 1, D[1], jnp.where(rq == 2, D[2], D[0]))
            det_ok = jnp.abs(best) >= best_eps
            det_inv = f32(1.0) / jnp.where(det_ok, best, f32(1.0))
            by_ = det_inv * by_num
            bz_ = det_inv * bz_num
            # every face has det > 0 (winding fix; asserted at build), so
            # the k >= 0 test reduces to best > 0
            k_ok = best > f32(0.0)
        elif FACE_MXU:
            N = rows * LANE
            gstk = jnp.concatenate(
                [grx.reshape(1, N), gry.reshape(1, N), grz.reshape(1, N)],
                axis=0,
            )  # (3, N)
            D3 = jax.lax.dot_general(
                nrm_ref[...], gstk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(20, rows, LANE)

            def ndot(i):
                return D3[i]
        elif FACE_SELECT == "shared":
            mags = sorted({float(abs(v)) for v in np.asarray(NRM).ravel()
                           if v != 0.0})
            g3 = (grx, gry, grz)
            prods = {}
            for ax in range(3):
                for mi, m in enumerate(mags):
                    prods[(ax, mi)] = f32(m) * g3[ax]

            def mag_idx(v):
                return min(range(len(mags)),
                           key=lambda k: abs(mags[k] - abs(float(v))))

            def ndot(i):
                acc = None
                for ax in range(3):
                    v = float(NRM[i, ax])
                    if v == 0.0:
                        continue
                    t = prods[(ax, mag_idx(v))]
                    if acc is None:
                        acc = t if v > 0 else -t
                    else:
                        acc = (acc + t) if v > 0 else (acc - t)
                return acc
        elif FACE_SELECT == "anti":
            NRMf = np.asarray(NRM, np.float32)
            anti = {}
            for fi in range(20):
                for fj in range(fi):
                    if np.array_equal(NRMf[fi], -NRMf[fj]):
                        anti[fi] = fj
            _dcache = {}

            def ndot(i):
                if i in _dcache:
                    return _dcache[i]
                if i in anti:
                    v = -_dcache[anti[i]]
                else:
                    v = (
                        f32(NRM[i, 0]) * grx
                        + f32(NRM[i, 1]) * gry
                        + f32(NRM[i, 2]) * grz
                    )
                _dcache[i] = v
                return v
        else:
            def ndot(i):
                return (
                    f32(NRM[i, 0]) * grx
                    + f32(NRM[i, 1]) * gry
                    + f32(NRM[i, 2]) * grz
                )

        if FACE_SELECT != "sym":
            best = ndot(0)
            cb = [jnp.full_like(grx, CBN[0, k]) for k in range(3)]
            cq = [jnp.full_like(grx, CQN[0, k]) for k in range(3)]
            vpk = jnp.full_like(az, VPK[0])
            for i in range(1, 20):
                d = ndot(i)
                upd = d > best  # strict: earlier face wins ties (cpu_baseline.cc:460)
                best = jnp.where(upd, d, best)
                for k in range(3):
                    cb[k] = jnp.where(upd, f32(CBN[i, k]), cb[k])
                    cq[k] = jnp.where(upd, f32(CQN[i, k]), cq[k])
                vpk = jnp.where(upd, VPK[i], vpk)
            vid0 = vpk & 15
            vid1 = (vpk >> 4) & 15
            vid2 = (vpk >> 8) & 15
            # winding sign: det > 0 iff best*sgn > 0
            sgn = jnp.where((vpk & (1 << 12)) > 0, f32(1.0), f32(-1.0))

            det_ok = jnp.abs(best) >= best_eps
            det_inv = f32(1.0) / jnp.where(det_ok, best, f32(1.0))
            by_ = det_inv * (cb[0] * grx + cb[1] * gry + cb[2] * grz)
            bz_ = det_inv * (cq[0] * grx + cq[1] * gry + cq[2] * grz)
            k_ok = best * sgn > f32(0.0)
        bx_ = f32(1.0) - by_ - bz_
        found = (
            nondeg & det_ok
            & (bx_ >= f32(-BARY_EPS)) & (by_ >= f32(-BARY_EPS))
            & (bz_ >= f32(-BARY_EPS)) & k_ok
        )

        mag = jnp.sqrt(g2)
        contrib = inside & bins_ok & found
        val = jnp.where(contrib, mag, f32(0.0))

        # spatial bin bases: trunc-toward-zero base, floor-based fraction
        basex = vbx.astype(jnp.int32)
        basey = vby.astype(jnp.int32)
        basez = vbz.astype(jnp.int32)
        fracx = vbx - jnp.floor(vbx)
        fracy = vby - jnp.floor(vby)
        fracz = vbz - jnp.floor(vbz)

        # --- accumulate: G/H as Kronecker factors over row groups ---------
        # G row g = (x, y) bin pair with g = x*4 + y; H row h = (z, vert)
        # with h = z*12 + vert — matching the XLA layout in ops/descriptor.py.
        # v6 (grouped): build the factors for GROUP sublane rows at once as
        # (4|12, GROUP, LANE) arrays — full (8, 128) VREG packing instead of
        # the per-row (4, LANE)/(12, LANE) shapes that waste sublanes — and
        # contract with one MXU dot per group over the collapsed
        # (GROUP*LANE) minor dims. The per-row variant (GROUP=1-equivalent)
        # is kept selectable via ACCUM_GROUP for TPU A/B. Contributions
        # fold onto the carry-in `acc` (see docstring).
        if ACCUM_GROUP > 1:
            GR = ACCUM_GROUP
            i4 = jax.lax.broadcasted_iota(jnp.int32, (4, GR, LANE), 0)
            i12 = jax.lax.broadcasted_iota(jnp.int32, (12, GR, LANE), 0)
            zero = jnp.zeros((4, GR, LANE), f32)
            zero12 = jnp.zeros((12, GR, LANE), f32)

            def axis_factor(base_g, frac_g):
                return jnp.where(
                    i4 == base_g, f32(1.0) - frac_g,
                    jnp.where(i4 == base_g + 1, frac_g, zero),
                )  # (4, GR, LANE)

            for g in range(rows // GR):
                def grp(a):
                    return a[g * GR: (g + 1) * GR][None]  # (1, GR, LANE)

                X = axis_factor(grp(basex), grp(fracx))
                Y = axis_factor(grp(basey), grp(fracy))
                Z = axis_factor(grp(basez), grp(fracz))
                V = (
                    jnp.where(i12 == grp(vid0), grp(bx_), zero12)
                    + jnp.where(i12 == grp(vid1), grp(by_), zero12)
                    + jnp.where(i12 == grp(vid2), grp(bz_), zero12)
                ) * grp(val)  # (12, GR, LANE)
                G = jnp.concatenate(
                    [X[k: k + 1] * Y for k in range(4)], axis=0
                ).reshape(16, GR * LANE)
                H = jnp.concatenate(
                    [Z[k: k + 1] * V for k in range(4)], axis=0
                ).reshape(48, GR * LANE)
                acc = acc + _accum_dot(G, H)
        else:
            i4 = jax.lax.broadcasted_iota(jnp.int32, (4, LANE), 0)
            i12 = jax.lax.broadcasted_iota(jnp.int32, (12, LANE), 0)
            zero = jnp.zeros((4, LANE), f32)
            zero12 = jnp.zeros((12, LANE), f32)

            def axis_factor(base_row, frac_row):
                return jnp.where(
                    i4 == base_row, f32(1.0) - frac_row,
                    jnp.where(i4 == base_row + 1, frac_row, zero),
                )  # (4, LANE)

            for s in range(rows):
                def row(a, s=s):
                    return a[s: s + 1, :]  # (1, LANE)

                def contribute(_, s=s, row=row):
                    X = axis_factor(row(basex), row(fracx))
                    Y = axis_factor(row(basey), row(fracy))
                    Z = axis_factor(row(basez), row(fracz))
                    V = (
                        jnp.where(i12 == row(vid0), row(bx_), zero12)
                        + jnp.where(i12 == row(vid1), row(by_), zero12)
                        + jnp.where(i12 == row(vid2), row(bz_), zero12)
                    ) * row(val)  # (12, LANE)
                    G = jnp.concatenate(
                        [X[k: k + 1] * Y for k in range(4)], axis=0)
                    H = jnp.concatenate(
                        [Z[k: k + 1] * V for k in range(4)], axis=0)
                    return _accum_dot(G, H)

                if ROW_SKIP:
                    # Rows with no contributing voxel (~25% fail the sphere
                    # test alone for interior keypoints; box/face rejections
                    # add more) have H == 0 identically — skipping them is
                    # exact, not an approximation.
                    acc = acc + jax.lax.cond(
                        jnp.any(row(val) != 0.0), contribute,
                        lambda _: jnp.zeros((16, 48), jnp.float32), 0)
                else:
                    acc = acc + contribute(0)

        return acc


def _kernel_sparse(
    kpi_ref,   # scalar-prefetch: (B, 12) int32 [sz sy sx cx cy cz xlo xhi ylo yhi zlo zhi]
    kpok_ref,  # scalar-prefetch: (B,) int32 accepted flag
    rot_ref,   # scalar-prefetch: (B, 16) f32: R^T row-major (9 used)
    etab_ref,  # scalar-prefetch: (nt8, 12) int32 per-8-row-chunk entries
    win_ref,                         # (1, rows_p + 2*extr, LANE) f32
    nrm_ref,                         # (20, 3) f32 outward face normals
    jz_ref, jy_ref, jx_ref,          # (1, SUB, LANE) int32 offset maps
    out_ref,                         # (1, 16, 48) f32 accumulator
    gx_s, gy_s, gz_s,                # scratch (rows_p, LANE) f32 gradients
    *,
    nt: int,
    rz: int,
    extr: int,
    wx: int,
    wxy: int,
    rows_p: int,
    unit: float,
    win_radius: float,
    sigma: float,
    desc_hw: float,
    desc_bin_fctr: float,
):
    """Sphere-sparse descriptor kernel (v7): gradients precomputed ONCE per
    keypoint into VMEM scratch (amortising the flat-shift extraction that a
    small chunk would pay (CH+2*extr)/CH times), then the per-voxel chain
    runs per 8-row subchunk, skipped by an EXACT-conservative scalar test
    against the keypoint's sphere: the reference's own in-sphere `continue`
    (sq_disp > win_radius^2, Src/cSIFT3D.cc:1270) realised at the finest
    granularity TPU sublane alignment allows. The skip bound
    min_sq_zy = fl(fl(dy_n^2) + fl(dz_n^2)) uses the kernel's exact f32
    expressions at the chunk's nearest (z, y) to the center, and RN
    rounding is monotone, so every skipped voxel provably fails the
    kernel's own `sq <= r2` test — results are bit-identical to the dense
    kernel."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    f32 = jnp.float32

    ok = kpok_ref[b]

    @pl.when(t == 0)
    def _():
        out_ref[0] = jnp.zeros((16, 48), jnp.float32)

    u = f32(unit)
    inv_u = f32(1.0) / u
    r2 = f32(win_radius) * f32(win_radius)
    sigma2 = f32(sigma) * f32(sigma)

    @pl.when((t == 0) & (ok > 0))
    def _grads():
        # Banded so the unrolled shift temporaries stay small on the 16MB
        # scoped-vmem stack (whole-window temps would be ~5 x 1.75MB x 3
        # grads at the 75^3 window). Band b covers padded rows
        # [r0, r0 + n + 2*extr): original rows r0-extr .. r0+n+extr, the
        # same +-extr halo validity argument as the dense kernel's tiles.
        BAND = 256
        nb = -(-rows_p // BAND)
        for bi in range(nb):
            r0 = bi * BAND
            n = min(BAND, rows_p - r0)
            ext = win_ref[0, pl.ds(r0, n + 2 * extr), :]
            for ref, k in ((gx_s, 1), (gy_s, wx), (gz_s, wxy)):
                vp = _shift_rows(ext, k)[extr: extr + n, :]
                vm = _shift_rows(ext, -k)[extr: extr + n, :]
                # exact op order of ops/windows.py central_gradients
                ref[pl.ds(r0, n), :] = f32(0.5) * (vp - vm) * inv_u

    # per-keypoint scalars
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

    z_lo_eff = jnp.maximum(zlo, cz - rz)
    z_hi_eff = jnp.minimum(zhi, cz + rz)

    def near_sq(lo, hi, c, s):
        """fl(((nearest in [lo+s, hi+s] to c) - c) * u)^2 — the exact f32
        value the kernel computes for the voxel nearest the center."""
        n = jnp.minimum(jnp.maximum(c, lo + s), hi + s)
        d = (n.astype(f32) - c.astype(f32)) * u
        return d * d

    def sub_live(e):
        zall_lo = etab_ref[e, 0]
        zall_hi = etab_ref[e, 1]
        yall_lo = etab_ref[e, 2]
        yall_hi = etab_ref[e, 3]
        boxz = (zall_lo + sz <= z_hi_eff) & (zall_hi + sz >= z_lo_eff)
        boxy = (yall_lo + sy <= yhi) & (yall_hi + sy >= ylo)

        def entry(o):
            ezlo = etab_ref[e, 4 + 4 * o]
            ezhi = etab_ref[e, 5 + 4 * o]
            eylo = etab_ref[e, 6 + 4 * o]
            eyhi = etab_ref[e, 7 + 4 * o]
            msq = near_sq(eylo, eyhi, cy, sy) + near_sq(ezlo, ezhi, cz, sz)
            return msq <= r2

        return (ok > 0) & boxz & boxy & (entry(0) | entry(1))

    R = [rot_ref[b, k] for k in range(9)]  # R^T row-major
    n8 = SUB // 8
    acc = jnp.zeros((16, 48), jnp.float32)
    for k in range(n8):
        e = t * n8 + k

        def _do(a, k=k):
            r0 = pl.multiple_of(t * SUB + k * 8, 8)
            # A/B: per-subchunk gradient extraction instead of the
            # per-keypoint scratch precompute — pays the (8+2*extr)/8
            # shift amplification on live chunks only.
            if _os.environ.get("SIFT3D_SPHERE_NOSCRATCH") == "1":
                ext = win_ref[0, pl.ds(r0, 8 + 2 * extr), :]

                def grad(kk):
                    vp = _shift_rows(ext, kk)[extr: extr + 8, :]
                    vm = _shift_rows(ext, -kk)[extr: extr + 8, :]
                    return f32(0.5) * (vp - vm) * inv_u

                gx0 = grad(1)
                gy0 = grad(wx)
                gz0 = grad(wxy)
            else:
                gx0 = gx_s[pl.ds(r0, 8), :]
                gy0 = gy_s[pl.ds(r0, 8), :]
                gz0 = gz_s[pl.ds(r0, 8), :]
            az = jz_ref[0][k * 8: (k + 1) * 8, :] + sz
            ay = jy_ref[0][k * 8: (k + 1) * 8, :] + sy
            ax = jx_ref[0][k * 8: (k + 1) * 8, :] + sx
            return _chain_acc(
                a, gx0, gy0, gz0, az, ay, ax, R,
                (cx, cy, cz, xlo, xhi, ylo, yhi, zlo, zhi),
                nrm_ref, u=u, r2=r2, sigma2=sigma2,
                desc_hw=desc_hw, desc_bin_fctr=desc_bin_fctr,
            )

        acc = jax.lax.cond(sub_live(e), _do, lambda a: a, acc)
    out_ref[0] = out_ref[0] + acc


def tile_entry_table(jzm_np: np.ndarray, jym_np: np.ndarray) -> np.ndarray:
    """(nt8, 12) int32 liveness entries per 8-row subchunk for the sparse
    kernel: [zall_lo zall_hi yall_lo yall_hi | e0: zlo zhi ylo yhi |
    e1: zlo zhi ylo yhi] over REAL (non-sentinel) core offsets. Chunks
    spanning <= 2 z-slabs (always true when wxy >= 8*LANE, i.e. the big
    windows that dominate) get exact per-slab y-ranges; wider spans merge
    into two conservative z-range entries. Empty chunks get BIG ranges
    whose box test can never pass."""
    CH = 8 * LANE
    nt8 = jzm_np.size // CH
    jz = jzm_np.reshape(nt8, CH)
    jy = jym_np.reshape(nt8, CH)
    real = jz < (1 << 19)
    BIG = np.int32(1 << 20)
    out = np.empty((nt8, 12), np.int32)
    for c in range(nt8):
        m = real[c]
        if not m.any():
            out[c] = [BIG, -1, BIG, -1] + [BIG, BIG, BIG, BIG] * 2
            continue
        zc, yc_ = jz[c][m], jy[c][m]
        zs = np.unique(zc)
        row = [zc.min(), zc.max(), yc_.min(), yc_.max()]

        def ent(zlo, zhi):
            sel = (zc >= zlo) & (zc <= zhi)
            return [zlo, zhi, yc_[sel].min(), yc_[sel].max()]

        if len(zs) == 1:
            row += ent(zs[0], zs[0]) + ent(zs[0], zs[0])
        elif len(zs) == 2:
            row += ent(zs[0], zs[0]) + ent(zs[1], zs[1])
        else:
            mid = len(zs) // 2
            row += ent(zs[0], zs[mid - 1]) + ent(zs[mid], zs[-1])
        out[c] = row
    return out


def window_offset_maps(wshape, cp: int):
    """Window-flat per-axis core-offset maps (cp,) int32.

    Flat index i decodes to window position (wz, wy, wx); interior positions
    (1 <= w <= W-2 on every axis — the only ones with a valid central
    difference, and the only ones the reference's clamped box can contain,
    ops/windows.py window_size slack) map to core offsets w-1; edge and pad
    positions get SENTINEL so every contribution test fails."""
    wz, wy, wx = wshape
    c = wz * wy * wx
    idx = np.arange(c, dtype=np.int64)
    pz = (idx // (wy * wx)).astype(np.int32)
    py = ((idx // wx) % wy).astype(np.int32)
    px = (idx % wx).astype(np.int32)
    interior = (
        (pz >= 1) & (pz <= wz - 2)
        & (py >= 1) & (py <= wy - 2)
        & (px >= 1) & (px <= wx - 2)
    )
    big = np.int32(SENTINEL)
    pad = cp - c
    out = []
    for p in (pz, py, px):
        m = np.where(interior, p - 1, big).astype(np.int32)
        out.append(np.concatenate([m, np.full(pad, big, np.int32)]))
    return tuple(out)


def tile_z_ranges(jzm_np: np.ndarray) -> np.ndarray:
    """(nt, 2) int32 [zmin, zmax] of real (non-sentinel) core z-offsets per
    voxel tile, for the kernel's slab-skip test. Sentinel lanes are
    excluded; an all-sentinel tile gets an empty range that can never
    intersect a box."""
    nt = jzm_np.size // TILE
    jz = jzm_np.reshape(nt, TILE)
    real = jz < (1 << 19)
    zmin = np.where(real, jz, np.int32(1 << 20)).min(axis=1)
    zmax = np.where(real, jz, np.int32(-1)).max(axis=1)
    return np.stack([zmin, zmax], axis=1).astype(np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("wshape", "consts", "interpret"),
)
def descriptor_bins_pallas(
    win,                 # (B, C_wp) f32 window VALUES, window-flat, padded
    jzm, jym, jxm,       # (C_wp,) int32 offset maps (window_offset_maps)
    ztab,                # (C_wp // TILE, 2) int32 per-tile [zmin zmax]
    kpi,                 # (B, 12) int32 per-kp ints
    kpok,                # (B,) int32
    rotT,                # (B, 16) f32 (R^T row-major, padded)
    wshape,              # static (Wz, Wy, Wx)
    consts,              # (unit, win_radius, sigma, desc_hw, desc_bin_fctr)
    interpret: bool = False,
):
    """Returns (B, 16, 48) descriptor accumulators (xy-major, zv-minor)."""
    B, C = win.shape
    assert C % TILE == 0
    nt = C // TILE
    wz, wy, wx = wshape
    unit, win_radius, sigma, desc_hw, desc_bin_fctr = consts
    rz = int(math.ceil(win_radius / unit)) + 1
    wxy = wy * wx
    # row reach of the z-shift, rounded so slice extents stay 8-aligned
    extr = -(-(wxy // LANE + 1) // 4) * 4

    rows = C // LANE
    common = dict(
        nt=nt, rz=rz, extr=extr, wx=wx, wxy=wxy, unit=unit,
        win_radius=win_radius, sigma=sigma, desc_hw=desc_hw,
        desc_bin_fctr=desc_bin_fctr,
    )
    scratch = []
    if SPHERE_SKIP:
        kernel = functools.partial(_kernel_sparse, rows_p=rows, **common)
        scratch = [pltpu.VMEM((rows, LANE), jnp.float32)] * 3
    else:
        kernel = functools.partial(_kernel, **common)

    win3 = jnp.pad(
        win.reshape(B, rows, LANE), ((0, 0), (extr, extr), (0, 0))
    )

    def j_spec():
        return pl.BlockSpec(
            (1, SUB, LANE), lambda b, t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(
                (1, rows + 2 * extr, LANE), lambda b, t, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((20, 3), lambda b, t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            j_spec(), j_spec(), j_spec(),
        ],
        out_specs=pl.BlockSpec(
            (1, 16, 48), lambda b, t, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )

    shape3 = (nt, SUB, LANE)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 16, 48), jnp.float32),
        interpret=interpret,
    )(
        kpi, kpok, rotT, ztab,
        win3,
        jnp.asarray(ARGMAX_CONST["normals"], jnp.float32),
        jzm.reshape(shape3), jym.reshape(shape3), jxm.reshape(shape3),
    )
