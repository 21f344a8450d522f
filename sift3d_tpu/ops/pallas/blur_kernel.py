"""Pallas TPU kernels for the separable Gaussian blur — the #1 hot loop.

The XLA path (ops/gaussian.py) encodes each axis pass as a dense (n, n)
smoothing-matrix matmul: simple and boundary-exact, but K = n deep — ~15x
more FLOPs than the kernel's tap count, and three full HBM round trips per
blur. These kernels do the tap convolution directly:

- interior voxels: an unrolled shifted-slice FMA loop over the 2*hw+1 taps
  (exact same accumulation order as the reference's d = -hw..hw loop,
  Src/cSIFT3D.cc:694-715);
- the 2*hw+1 boundary rows per axis (mirror + conv_eps interpolation) stay
  encoded as rows of the smoothing matrix and are applied as one small MXU
  product per axis.

Two kernels per blur: XY (X then Y pass fused in VMEM, grid over z-slabs —
no halo needed because each slab holds full y/x extents) and Z (grid over
y-slabs). HBM traffic: 4 volume passes per blur instead of 6, at tap-count
FLOPs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...pyramid import gaussian_kernel, smoothing_matrix


def _boundary_rows(n: int, kernel: np.ndarray):
    """(top_rows, bottom_rows) of the smoothing matrix: the rows outside the
    interior band [hw, n-hw-2]."""
    hw = len(kernel) // 2
    W = smoothing_matrix(n, kernel)
    top = W[: min(hw, n)]
    bot_start = max(n - hw - 1, min(hw, n))
    bot = W[bot_start:]
    return top.astype(np.float32), bot.astype(np.float32), bot_start


def _axis_pass_flat(flat, n, taps, top_ref, bot_ref, n_top, bot_start):
    """One axis pass on (rows, n) data with the conv along the last dim."""
    f32 = jnp.float32
    hw = (len(taps) - 1) // 2
    n_int = n - 2 * hw - 1
    dot_kw = dict(
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    parts = []
    if n_top > 0:
        parts.append(
            jax.lax.dot_general(flat, top_ref[:], (((1,), (1,)), ((), ())), **dot_kw)
        )
    if n_int > 0:
        acc = f32(taps[0]) * flat[:, 2 * hw : 2 * hw + n_int]
        for d in range(-hw + 1, hw + 1):
            # tap index d, reading column x - d for x in [hw, n-hw-2]
            acc = acc + f32(taps[d + hw]) * flat[:, hw - d : hw - d + n_int]
        parts.append(acc)
    if bot_start < n:
        parts.append(
            jax.lax.dot_general(flat, bot_ref[:], (((1,), (1,)), ((), ())), **dot_kw)
        )
    return jnp.concatenate(parts, axis=1)


def _xy_kernel(in_ref, xt_ref, xb_ref, yt_ref, yb_ref, out_ref, *, taps,
               x_meta, y_meta):
    tz, ny, nx = in_ref.shape[1:]
    v = in_ref[0]
    # X pass: conv along last dim on (tz*ny, nx)
    flat = v.reshape(tz * ny, nx)
    flat = _axis_pass_flat(flat, nx, taps, xt_ref, xb_ref, *x_meta)
    v = flat.reshape(tz, ny, nx)
    # Y pass: per z-slab, conv along rows of (ny, nx): transpose-free by
    # treating y as the contraction dim of (ny, nx) slabs
    outs = []
    for z in range(tz):
        s = v[z]  # (ny, nx)
        # operate on (nx, ny): conv along last dim again
        flat_y = jnp.swapaxes(s, 0, 1)  # (nx, ny)
        flat_y = _axis_pass_flat(flat_y, ny, taps, yt_ref, yb_ref, *y_meta)
        outs.append(jnp.swapaxes(flat_y, 0, 1))
    out_ref[0] = jnp.stack(outs, axis=0)


def _z_kernel(in_ref, zt_ref, zb_ref, out_ref, *, taps, z_meta):
    nz, ty, nx = in_ref.shape[1:]
    v = in_ref[0].reshape(nz, ty * nx)
    # conv along FIRST dim: transpose roles by slicing rows
    f32 = jnp.float32
    hw = (len(taps) - 1) // 2
    n_int = nz - 2 * hw - 1
    n_top, bot_start = z_meta
    dot_kw = dict(
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    parts = []
    if n_top > 0:
        parts.append(
            jax.lax.dot_general(zt_ref[:], v, (((1,), (0,)), ((), ())), **dot_kw)
        )
    if n_int > 0:
        acc = f32(taps[0]) * v[2 * hw : 2 * hw + n_int, :]
        for d in range(-hw + 1, hw + 1):
            acc = acc + f32(taps[d + hw]) * v[hw - d : hw - d + n_int, :]
        parts.append(acc)
    if bot_start < nz:
        parts.append(
            jax.lax.dot_general(zb_ref[:], v, (((1,), (0,)), ((), ())), **dot_kw)
        )
    out_ref[0] = jnp.concatenate(parts, axis=0).reshape(nz, ty, nx)


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def gaussian_blur_pallas(vol: jnp.ndarray, sigma: float, interpret: bool = False):
    """Separable blur, reference axis order X -> Y -> Z, boundary-exact."""
    nz, ny, nx = vol.shape
    k = gaussian_kernel(sigma)
    taps = tuple(float(t) for t in k)

    xt, xb, x_bs = _boundary_rows(nx, k)
    yt, yb, y_bs = _boundary_rows(ny, k)
    zt, zb, z_bs = _boundary_rows(nz, k)

    # z-slab size for the XY kernel; y-slab for the Z kernel
    tz = max(1, min(nz, max(1, (1 << 21) // max(ny * nx * 4, 1))))
    while nz % tz:
        tz -= 1
    # ty is a block sublane-adjacent dim: must divide ny and be a multiple
    # of 8 (or the full extent) for the TPU tiling rule
    budget_ty = max(1, min(ny, max(1, (1 << 21) // max(nz * nx * 4, 1))))
    ty = ny
    for cand in range(budget_ty, 0, -1):
        if ny % cand == 0 and (cand % 8 == 0 or cand == ny):
            ty = cand
            break

    xy = pl.pallas_call(
        functools.partial(
            _xy_kernel, taps=taps,
            x_meta=(xt.shape[0], x_bs), y_meta=(yt.shape[0], y_bs),
        ),
        grid=(nz // tz,),
        in_specs=[
            pl.BlockSpec((1, tz, ny, nx), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(xt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(xb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(yt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(yb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tz, ny, nx), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz // tz, tz, ny, nx), jnp.float32),
        interpret=interpret,
    )(
        vol.reshape(nz // tz, tz, ny, nx),
        jnp.asarray(xt), jnp.asarray(xb), jnp.asarray(yt), jnp.asarray(yb),
    ).reshape(nz, ny, nx)

    out = pl.pallas_call(
        functools.partial(_z_kernel, taps=taps, z_meta=(zt.shape[0], z_bs)),
        grid=(ny // ty,),
        in_specs=[
            pl.BlockSpec((1, nz, ty, nx), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(zt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(zb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nz, ty, nx), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nz, ny, nx), jnp.float32),
        interpret=interpret,
    )(
        xy.reshape(1, nz, ny, nx), jnp.asarray(zt), jnp.asarray(zb)
    )
    return out[0]
