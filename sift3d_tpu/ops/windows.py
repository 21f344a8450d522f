"""Fixed-size keypoint window gathering.

The reference's orientation/descriptor stages loop per keypoint over a
clamped spherical window (Src/cSIFT3D.cc:939-955, 1182-1198). TPU-first
equivalent: because the window radius depends only on the keypoint *scale*
and every keypoint in one pyramid level shares the same scale
(Initialize_Pyramid, Src/cUtil.cc:209-210), all windows in a level have one
static size. We gather a fixed (Wz, Wy, Wx) cube per keypoint from a
zero-padded level volume with vmapped dynamic_slice, and reproduce the
reference's exact per-keypoint box clamping with masks computed from the
same float32 floor/ceil arithmetic.

The gathered cube always covers the clamped reference box plus the +-1
gradient margin (see _window_size for the slack analysis), so masked
contributions only ever read true in-volume voxels.
"""

from __future__ import annotations

import math
import os as _os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IMG_BORDER

# DMA-kernel window gather on TPU (see gather_windows). DISABLED: Mosaic
# rejects DMA slices whose second-minor extent is not a multiple of the
# (8, 128) tiling ("Slice shape along dimension 1 must be aligned to
# tiling (8), but is 21"), and window extents are always odd
# (2*ceil(r)+5); floor-aligning the starts would shift the window content
# per keypoint and break the level-shared flat offset maps. The ~105 ms
# of per-keypoint DUS copies therefore stands until a fused
# gather-to-flat kernel exists. Kept for the record / future alignment
# experiments (SIFT3D_PALLAS_GATHER=1).
PALLAS_GATHER = [_os.environ.get("SIFT3D_PALLAS_GATHER", "0") == "1"]


def radius_voxels(win_radius_phys: float, unit: float) -> float:
    """win_radius / unit in the reference's float32 arithmetic
    (e.g. Src/cSIFT3D.cc:939: vcenter.x - win_radius / uxf)."""
    return float(np.float32(np.float32(win_radius_phys) / np.float32(unit)))


import functools as _functools


@_functools.lru_cache(maxsize=None)
def window_size(r_vox: float, n_padded: int) -> int:
    """Static per-axis window extent: the MINIMAL extent that covers the
    reference's clamped box (box_bounds, Src/cSIFT3D.cc:939-955) plus the
    +-1 gradient margin for every possible center coordinate.

    Computed exactly by brute force over all centers with the same float32
    floor/ceil arithmetic as box_bounds (r_vox and n_padded are static per
    pyramid level, so this runs once per level at trace time). For integer
    centers the clamped span is 2*ceil(r)+1 except where f32 rounding of
    c +- r crosses an integer, so the exact extent is typically
    2*ceil(r)+3 — two voxels tighter per axis than the conservative
    2*ceil(r)+5 bound used through round 3 (-8..11% window voxels).
    Downstream masks test true coordinates, so any covering extent yields
    bit-identical results (verified by the parity suite)."""
    cap = min(2 * int(math.ceil(r_vox)) + 5, n_padded)
    n = n_padded - 2
    if n <= 2:
        return cap
    r = np.float32(r_vox)
    c = np.arange(n, dtype=np.float32)
    start = np.floor(c - r).astype(np.int64)
    start = np.where(start > 1, start, IMG_BORDER)
    end = np.ceil(c + r).astype(np.int64)
    end = np.where(end < n - 2, end, n - 1 - IMG_BORDER)
    ci = np.arange(n, dtype=np.int64)
    for W in range(3, cap):
        rm = (W - 1) // 2
        s = np.clip(ci + 1 - rm, 0, n_padded - W)
        if np.all((s <= start) & (s + W - 1 >= end + 2)):
            return W
    return cap


def gather_windows(
    vol_padded: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    zs: jnp.ndarray,
    wshape: tuple[int, int, int],
    z_off=0,
    nzp: int | None = None,
    y_off=0,
    nyp: int | None = None,
    use_pallas: bool = False,
):
    """Gather (B, Wz, Wy, Wx) windows centred on integer keypoint coords.

    vol_padded: (nz+2, ny+2, nx+2), zero halo of 1.
    Returns (windows, (sz, sy, sx)) where s* are the *padded* slice starts,
    so a core voxel at window index j (axis offset after trimming the
    gradient margin) has unpadded coordinate s + j.

    Multi-chip block mode: `vol_padded` may instead be a halo-extended
    local slab whose row `zp - z_off` (and, on a 2-D z x y mesh, column
    `yp - y_off`) holds the GLOBAL padded row zp / column yp
    (parallel/sharded_pallas.py). Coords stay global; pass the global
    padded extents as `nzp`/`nyp` so the start clamps are identical to the
    single-chip gather, and the slab's halos must cover every clamped
    window of its own keypoints. `z_off`/`y_off` may be traced scalars.
    """
    Wz, Wy, Wx = wshape
    nzp_local, nyp_local, nxp = vol_padded.shape
    if nzp is None:
        nzp = nzp_local
    if nyp is None:
        nyp = nyp_local

    def start(c, W, npad):
        rm = (W - 1) // 2
        return jnp.clip(c + 1 - rm, 0, npad - W)

    sz = start(zs, Wz, nzp)
    sy = start(ys, Wy, nyp)
    sx = start(xs, Wx, nxp)

    # On TPU, the vmapped dynamic_slice lowers to one tiny DUS per keypoint
    # (~6.5 us each, ~105 ms of the 256^3 pair); the Pallas kernel issues
    # one strided HBM->HBM DMA per keypoint instead (bit-identical: a
    # copy). Callers opt in only from the Pallas-kernel stage variants, so
    # the GSPMD path (use_pallas=False configs, XLA-partitionable) and CPU
    # keep the vmapped gather.
    if use_pallas and PALLAS_GATHER[0] and jax.default_backend() == "tpu":
        from .pallas.gather_kernel import gather_windows_pallas

        wins = gather_windows_pallas(vol_padded, sz - z_off, sy - y_off, sx,
                                     (Wz, Wy, Wx))
        return wins, (sz, sy, sx)

    def one(s0, s1, s2):
        return jax.lax.dynamic_slice(
            vol_padded, (s0 - z_off, s1 - y_off, s2), (Wz, Wy, Wx)
        )

    wins = jax.vmap(one)(sz, sy, sx)
    return wins, (sz, sy, sx)


def box_bounds(c: jnp.ndarray, r_vox: float, n: int):
    """Reference per-axis clamped window bounds (Src/cSIFT3D.cc:939-955):
    start = floor(c - r) clamped to IMG_BORDER if <= 1;
    end = ceil(c + r) clamped to n-1-IMG_BORDER if >= n-2.
    Computed in float32 like the reference. c: int32 coords."""
    cf = c.astype(jnp.float32)
    r = jnp.float32(r_vox)
    start = jnp.floor(cf - r).astype(jnp.int32)
    start = jnp.where(start > 1, start, IMG_BORDER)
    end = jnp.ceil(cf + r).astype(jnp.int32)
    end = jnp.where(end < n - 2, end, n - 1 - IMG_BORDER)
    return start, end


def core_coords(starts, wshape: tuple[int, int, int]):
    """Unpadded absolute coordinates of the core (gradient-capable) voxels.

    Core index j in [0, W-3] along each axis maps to coordinate s + j.
    Returns three (B, W-2) int arrays (z, y, x).
    """
    sz, sy, sx = starts
    Wz, Wy, Wx = wshape
    az = sz[:, None] + jnp.arange(Wz - 2)[None, :]
    ay = sy[:, None] + jnp.arange(Wy - 2)[None, :]
    ax = sx[:, None] + jnp.arange(Wx - 2)[None, :]
    return az, ay, ax


def central_gradients(wins: jnp.ndarray, unit: float):
    """Central differences * 0.5 / unit on the window core
    (Src/cSIFT3D.cc:973-983). wins: (B, Wz, Wy, Wx) ->
    three (B, Wz-2, Wy-2, Wx-2) arrays (gx, gy, gz)."""
    inv_u = jnp.float32(1.0) / jnp.float32(unit)
    gx = jnp.float32(0.5) * (wins[:, 1:-1, 1:-1, 2:] - wins[:, 1:-1, 1:-1, :-2]) * inv_u
    gy = jnp.float32(0.5) * (wins[:, 1:-1, 2:, 1:-1] - wins[:, 1:-1, :-2, 1:-1]) * inv_u
    gz = jnp.float32(0.5) * (wins[:, 2:, 1:-1, 1:-1] - wins[:, :-2, 1:-1, 1:-1]) * inv_u
    return gx, gy, gz
