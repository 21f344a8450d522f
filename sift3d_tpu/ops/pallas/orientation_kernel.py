"""Pallas TPU kernel for orientation window statistics.

Computes, per keypoint, the Gaussian-weighted structure tensor (6 unique
elements) and mean gradient (3) over the clamped spherical window
(Assign_Orientation_Imp, reference Src/cSIFT3D.cc:958-998) in one pass —
the XLA formulation materialises ~20 intermediates per window voxel to HBM.

v2 (fused gradients, mirroring descriptor kernel v5): the input is the RAW
gathered window values, flattened window-major, one whole-window VMEM block
per keypoint; central differences are computed in-kernel from flat-shifted
copies, so the XLA stage no longer materialises (B, C) gradient streams.
Window-edge positions (no valid central difference) carry sentinel offset
maps. Grid steps are skipped when a tile's z-slab cannot contribute or the
keypoint lane is invalid.

Layout: grid (B keypoints, T voxel tiles) of (SUB, LANE) window positions,
shared per-level offset maps, per-keypoint scalars via scalar prefetch.
Output row per keypoint: (8, 128) f32 with lanes 0-8 of row 0 holding
[xx xy xz yy yz zz | mx my mz].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8
LANE = 2048
TILE = SUB * LANE


def _shift_rows(ext, k: int, lane: int):
    """out[r, l] = ext[flat(r*lane + l + k)] (see descriptor kernel v5)."""
    q, rml = divmod(k, lane)
    nrow = ext.shape[0]

    def rroll(x, r):
        return pltpu.roll(x, (-r) % nrow, 0)

    if rml == 0:
        return rroll(ext, q)
    a = pltpu.roll(ext, (lane - rml) % lane, 1)
    a1 = rroll(a, q)
    a2 = rroll(a, q + 1)
    li = jax.lax.broadcasted_iota(jnp.int32, ext.shape, 1)
    return jnp.where(li < lane - rml, a1, a2)


def _kernel(
    kpi_ref,   # scalar-prefetch: (B, 12) int32 [sz sy sx cx cy cz xlo xhi ylo yhi zlo zhi]
    kpok_ref,  # scalar-prefetch: (B,) int32 validity
    ztab_ref,  # scalar-prefetch: (nt, 2) int32 per-tile [zmin zmax] offsets
    win_ref,                         # (1, R + 2*EXTR, LANE) f32 window values
    jz_ref, jy_ref, jx_ref,          # (1, SUB, LANE) int32
    out_ref,                         # (1, 8, 128) f32
    *,
    extr: int,
    wx: int,
    wxy: int,
    rz: int,
    unit: float,
    win_radius: float,
    sigma: float,
):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[0] = jnp.zeros((8, 128), jnp.float32)

    f32 = jnp.float32

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

        row0 = pl.multiple_of(t * SUB, SUB)
        ext = win_ref[0, pl.ds(row0, SUB + 2 * extr), :]

        def grad(k):
            vp = _shift_rows(ext, k, LANE)[extr: extr + SUB, :]
            vm = _shift_rows(ext, -k, LANE)[extr: extr + SUB, :]
            return f32(0.5) * (vp - vm) * inv_u

        gx = grad(1)
        gy = grad(wx)
        gz = grad(wxy)

        az = jz_ref[0] + sz
        ay = jy_ref[0] + sy
        ax = jx_ref[0] + sx

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

        w = jnp.where(inside, jnp.exp(f32(-0.5) * sq / sigma2), f32(0.0))

        sums = [
            jnp.sum(gx * gx * w), jnp.sum(gx * gy * w), jnp.sum(gx * gz * w),
            jnp.sum(gy * gy * w), jnp.sum(gy * gz * w), jnp.sum(gz * gz * w),
            jnp.sum(gx * w), jnp.sum(gy * w), jnp.sum(gz * w),
        ]

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        contrib = jnp.zeros((8, 128), jnp.float32)
        for k, s in enumerate(sums):
            contrib = contrib + jnp.where(
                (row_ids == 0) & (lane_ids == k), s, f32(0.0)
            )
        out_ref[0] = out_ref[0] + contrib


def ori_window_maps(wshape, cp: int):
    """Window-flat offset maps with edge/pad sentinels (this kernel's TILE
    differs from the descriptor kernel's, so maps are built per caller)."""
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
    big = np.int32(1 << 20)
    pad = cp - c
    out = []
    for p in (pz, py, px):
        m = np.where(interior, p - 1, big).astype(np.int32)
        out.append(np.concatenate([m, np.full(pad, big, np.int32)]))
    return tuple(out)


def ori_tile_z_ranges(jzm_np: np.ndarray) -> np.ndarray:
    nt = jzm_np.size // TILE
    jz = jzm_np.reshape(nt, TILE)
    real = jz < (1 << 19)
    zmin = np.where(real, jz, np.int32(1 << 20)).min(axis=1)
    zmax = np.where(real, jz, np.int32(-1)).max(axis=1)
    return np.stack([zmin, zmax], axis=1).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("wshape", "consts", "interpret"))
def orientation_stats_pallas(
    win,                 # (B, C_wp) f32 window values, window-flat, padded
    jzm, jym, jxm,       # (C_wp,) int32 offset maps (ori_window_maps)
    ztab,                # (C_wp // TILE, 2) int32 (ori_tile_z_ranges)
    kpi,                 # (B, 12) int32
    kpok,                # (B,) int32
    wshape,              # static (Wz, Wy, Wx)
    consts,              # (unit, win_radius, sigma)
    interpret: bool = False,
):
    """Returns (st (B, 6), mg (B, 3)): structure tensors + mean gradients."""
    B, C = win.shape
    assert C % TILE == 0
    nt = C // TILE
    wz, wy, wx = wshape
    unit, win_radius, sigma = consts
    wxy = wy * wx
    rz = int(math.ceil(win_radius / unit)) + 1
    extr = -(-(wxy // LANE + 1) // 4) * 4

    kernel = functools.partial(
        _kernel, extr=extr, wx=wx, wxy=wxy, rz=rz,
        unit=unit, win_radius=win_radius, sigma=sigma,
    )

    rows = C // LANE
    win3 = jnp.pad(
        win.reshape(B, rows, LANE), ((0, 0), (extr, extr), (0, 0))
    )

    def j_spec():
        return pl.BlockSpec(
            (1, SUB, LANE), lambda b, t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(
                (1, rows + 2 * extr, LANE), lambda b, t, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            j_spec(), j_spec(), j_spec(),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 128), lambda b, t, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    shape3 = (nt, SUB, LANE)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        interpret=interpret,
    )(
        kpi, kpok, ztab,
        win3,
        jzm.reshape(shape3), jym.reshape(shape3), jxm.reshape(shape3),
    )
    return out[:, 0, :6], out[:, 0, 6:9]
