"""Pallas TPU kernel for orientation window statistics.

Computes, per keypoint, the Gaussian-weighted structure tensor (6 unique
elements) and mean gradient (3) over the clamped spherical window
(Assign_Orientation_Imp, reference Src/cSIFT3D.cc:958-998) in one pass over
the gradient tiles — the XLA formulation materialises ~20 intermediates per
window voxel to HBM.

Same layout as the descriptor kernel: grid (B keypoints, T voxel tiles) of
(SUB, LANE) voxels, shared per-level coordinate maps, per-keypoint scalars
via scalar prefetch. Output row per keypoint: (8, 128) f32 with lanes 0-8 of
row 0 holding [xx xy xz yy yz zz | mx my mz] (padded block shape keeps the
(8, 128) tiling rule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8
LANE = 2048
TILE = SUB * LANE


def _kernel(
    kpi_ref,   # scalar-prefetch: (B, 12) int32 [sz sy sx cx cy cz xlo xhi ylo yhi zlo zhi]
    kpok_ref,  # scalar-prefetch: (B,) int32 validity
    gx_ref, gy_ref, gz_ref,          # (1, 1, SUB, LANE) f32
    jz_ref, jy_ref, jx_ref,          # (1, SUB, LANE) int32
    out_ref,                         # (1, 8, 128) f32
    *,
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

    az = jz_ref[0] + sz
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

    w = jnp.where(inside, jnp.exp(f32(-0.5) * sq / sigma2), f32(0.0))
    gx = gx_ref[0, 0]
    gy = gy_ref[0, 0]
    gz = gz_ref[0, 0]

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


@functools.partial(jax.jit, static_argnames=("consts", "interpret"))
def orientation_stats_pallas(
    gx, gy, gz,          # (B, C) f32, C % TILE == 0
    jzm, jym, jxm,       # (C,) int32 core-offset maps
    kpi,                 # (B, 12) int32
    kpok,                # (B,) int32
    consts,              # (unit, win_radius, sigma)
    interpret: bool = False,
):
    """Returns (st (B, 6), mg (B, 3)): structure tensors + mean gradients."""
    B, C = gx.shape
    assert C % TILE == 0
    nt = C // TILE
    unit, win_radius, sigma = consts

    kernel = functools.partial(
        _kernel, unit=unit, win_radius=win_radius, sigma=sigma
    )

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
        num_scalar_prefetch=2,
        grid=(B, nt),
        in_specs=[g_spec(), g_spec(), g_spec(), j_spec(), j_spec(), j_spec()],
        out_specs=pl.BlockSpec(
            (1, 8, 128), lambda b, t, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    shape4 = (B, nt, SUB, LANE)
    shape3 = (nt, SUB, LANE)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        interpret=interpret,
    )(
        kpi, kpok,
        gx.reshape(shape4), gy.reshape(shape4), gz.reshape(shape4),
        jzm.reshape(shape3), jym.reshape(shape3), jxm.reshape(shape3),
    )
    return out[:, 0, :6], out[:, 0, 6:9]
