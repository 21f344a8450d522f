"""Pallas TPU kernel for the separable Gaussian blur — the #1 hot loop.

The XLA path (ops/gaussian.py) encodes each axis pass as a dense (n, n)
smoothing-matrix matmul: simple and boundary-exact, but K = n deep — ~15x
more FLOPs than the kernel's tap count, and three full HBM round trips per
blur. This kernel fuses the X and Y passes in VMEM (grid over z-slabs; no
halo needed because each slab holds full y/x extents) with the tap
convolution done directly; the Z pass stays a smoothing-matrix einsum.

Mosaic constraints that shaped the implementation:
- unrolled `+=` statements each materialise their RHS, so a fully unrolled
  tap loop over full slabs blows the 16MB scoped-vmem budget -> the row
  loop is a fori_loop (small live set) while taps unroll statically over
  value chunks;
- dynamic lane-dimension slicing must be 128-aligned -> tap shifts are
  static column slices of a row-chunk value; the dynamic dimension is the
  sublane-aligned row offset (pl.multiple_of hint).

Interior voxels follow the reference's d = -hw..hw accumulation order
(Src/cSIFT3D.cc:694-715); the 2*hw+1 boundary rows per axis (mirror +
conv_eps interpolation) are rows of the smoothing matrix applied as one
small MXU product per axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...pyramid import gaussian_kernel, smoothing_matrix

_DOT_KW = dict(
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)

_ROWS = 64  # row chunk per fori_loop iteration (multiple of 8)


def _boundary_rows(n: int, kernel: np.ndarray):
    """(top_rows, bottom_rows, bot_start) of the smoothing matrix: the rows
    outside the interior band [hw, n-hw-2]."""
    hw = len(kernel) // 2
    W = smoothing_matrix(n, kernel)
    top = W[: min(hw, n)]
    bot_start = max(n - hw - 1, min(hw, n))
    bot = W[bot_start:]
    return top.astype(np.float32), bot.astype(np.float32), bot_start


def _conv_rows(dst_ref, src_ref, rows, n, taps, top_ref, bot_ref, n_top,
               bot_start):
    """Conv along the last dim of the (rows, n) src_ref into dst_ref,
    chunked over rows with a fori_loop; taps statically unrolled per chunk."""
    f32 = jnp.float32
    width = len(taps)
    hw = (width - 1) // 2
    n_int = n - 2 * hw - 1
    rc = _ROWS
    while rows % rc:
        rc //= 2
    rc = max(rc, 1)

    def body(i, _):
        r0 = pl.multiple_of(i * rc, 8)
        chunk = src_ref[pl.ds(r0, rc), :]  # (rc, n)
        if n_int > 0:
            acc = f32(taps[0]) * chunk[:, 2 * hw : 2 * hw + n_int]
            for j in range(1, width):
                acc = acc + f32(taps[j]) * chunk[:, 2 * hw - j : 2 * hw - j + n_int]
            dst_ref[pl.ds(r0, rc), hw : hw + n_int] = acc
        if n_top > 0:
            dst_ref[pl.ds(r0, rc), :n_top] = jax.lax.dot_general(
                chunk, top_ref[:], (((1,), (1,)), ((), ())), **_DOT_KW
            )
        if bot_start < n:
            dst_ref[pl.ds(r0, rc), bot_start:] = jax.lax.dot_general(
                chunk, bot_ref[:], (((1,), (1,)), ((), ())), **_DOT_KW
            )
        return 0

    jax.lax.fori_loop(0, rows // rc, body, 0)


def _xy_kernel(in_ref, xt_ref, xb_ref, yt_ref, yb_ref, out_ref,
               iscr, xscr, tscr, yscr, *, taps, x_meta, y_meta):
    tz, ny, nx = in_ref.shape[1:]

    # Flatten the slab once into a 2-D scratch so the conv can slice rows
    # of a plain (rows, n) ref.
    iscr[:, :] = in_ref[0].reshape(tz * ny, nx)

    # X pass: rows = tz*ny, lanes = x, into xscr
    _conv_rows(xscr, iscr, tz * ny, nx, taps, xt_ref, xb_ref, *x_meta)

    # Y pass per z-slab: transpose into tscr (rows = x, lanes = y), conv
    # into yscr, transpose back on write-out
    def zbody(z, _):
        tscr[:, :] = jnp.swapaxes(xscr[pl.ds(z * ny, ny), :], 0, 1)
        _conv_rows(yscr, tscr, nx, ny, taps, yt_ref, yb_ref, *y_meta)
        out_ref[0, pl.ds(z, 1)] = jnp.swapaxes(yscr[:], 0, 1)[None]
        return 0

    jax.lax.fori_loop(0, tz, zbody, 0)


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def gaussian_blur_pallas(vol: jnp.ndarray, sigma: float, interpret: bool = False):
    """Separable blur, reference axis order X -> Y -> Z, boundary-exact."""
    nz, ny, nx = vol.shape
    k = gaussian_kernel(sigma)
    taps = tuple(float(t) for t in k)

    xt, xb, x_bs = _boundary_rows(nx, k)
    yt, yb, y_bs = _boundary_rows(ny, k)

    # z-slab size: double-buffered in+out plus scratch must fit scoped vmem
    tz = max(1, min(nz, max(1, (1 << 20) // max(ny * nx * 4, 1))))
    while nz % tz:
        tz -= 1

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
        scratch_shapes=[
            pltpu.VMEM((tz * ny, nx), jnp.float32),
            pltpu.VMEM((tz * ny, nx), jnp.float32),
            pltpu.VMEM((nx, ny), jnp.float32),
            pltpu.VMEM((nx, ny), jnp.float32),
        ],
        interpret=interpret,
    )(
        vol.reshape(nz // tz, tz, ny, nx),
        jnp.asarray(xt), jnp.asarray(xb), jnp.asarray(yt), jnp.asarray(yb),
    ).reshape(nz, ny, nx)

    # Z pass: smoothing-matrix contraction on the MXU (the tap formulation
    # along the non-lane z axis hits Mosaic temp-allocation limits).
    Wz = jnp.asarray(smoothing_matrix(nz, k))
    return jnp.einsum("zj,jyx->zyx", Wz, xy, **_DOT_KW)
