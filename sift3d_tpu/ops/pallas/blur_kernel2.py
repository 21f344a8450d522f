"""Streaming separable Gaussian blur — v2, no transposes, no relayouts.

v1 (blur_kernel.py) fused X+Y per z-slab but paid a per-plane transpose
for the Y pass (1.6x slower than the einsum on v5e) and left the Z pass as
a dense K=n smoothing-matrix einsum. v2:

- X pass: tap FMAs along the LANE dim (static column slices), interior and
  boundary columns both in-kernel (boundary via small MXU products of the
  exact smoothing-matrix rows, i.e. the conv_eps mirror math of
  Src/cSIFT3D.cc:744-755).
- Y pass: tap FMAs along the SUBLANE dim of the (nz*ny, nx) view — per-tap
  shifts are static sublane slices of a halo-padded scratch, so no
  transpose materialises. Rows in the y-boundary bands read cross-plane
  garbage inside the kernel and are overwritten afterwards by a small XLA
  einsum over the exact boundary matrix rows ((2*hw+1)/ny of a full pass).
- Z pass: a second kernel on (nz, ny, nx) blocks of 8 y-rows — the z taps
  are static MAJOR-dim slices (nz is an untiled leading dim, so shifting it
  moves whole (8, nx) registers; no relayout); z-boundary bands again via
  a small XLA einsum.

Every pass streams one read + one write of the volume (plus the ~hw/n
boundary bands) instead of the einsum's K=n MXU contraction at f32-HIGHEST
(~15x the tap FLOPs). Tap accumulation order matches the reference's
d-loop on every axis (out[c] = sum_j taps[j]*src[c+hw-j],
Src/cSIFT3D.cc:694-715).

Layout constraint: the (nz*ny, nx) <-> (nz, ny, nx) views are layout-free
only when ny % 8 == 0; gaussian.py falls back to the einsum otherwise
(all power-of-two pyramid chains qualify).
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
    """(top_rows, bottom_rows, bot_start): smoothing-matrix rows outside the
    interior band [hw, n-hw-2] (identical math to the einsum path)."""
    hw = len(kernel) // 2
    W = smoothing_matrix(n, kernel)
    top = W[: min(hw, n)]
    bot_start = max(n - hw - 1, min(hw, n))
    bot = W[bot_start:]
    return top.astype(np.float32), bot.astype(np.float32), bot_start


def _round8(v: int) -> int:
    return -(-v // 8) * 8


def _lanes(n: int) -> int:
    """Physical lane extent: the minor dim pads to a multiple of 128 in
    VMEM (192 lanes occupy 256 — sizing budgets on the LOGICAL extent
    under-counts by up to 2x and blew the 16MB scoped-vmem stack at
    (384, 256, 192), r4)."""
    return -(-n // 128) * 128


def z_lane_chunk(nz: int, nx: int) -> int | None:
    """Lane chunk nx_c for the z-pass blocks: must divide nx and be
    Mosaic-legal (nx_c == nx, i.e. the full lane dim, or nx_c % 128 == 0 —
    a partial lane block of e.g. 96 is rejected at lowering, advisor r3).
    Picks the largest legal chunk whose (nz, 8, nx_c) in+out blocks fit
    the ~2MB-per-block budget (PADDED lane extent); tolerates up to 2.5MB
    on the smallest legal chunk (the in+out blocks double-buffer to 4x the
    chunk, plus ~25% tap temps on the 16MB scoped-vmem stack — a 3.1MB
    chunk measured 17.5MB, r4); returns None (caller falls back to the
    einsum blur) otherwise."""
    legal = [nx] + [c for c in range(128, nx, 128) if nx % c == 0]
    budget = [c for c in legal if nz * 8 * _lanes(c) * 4 <= (2 << 20)]
    if budget:
        return max(budget)
    smallest = min(legal)
    # hard cap: in+out blocks double-buffer (4x the chunk) plus ~25% tap
    # temps on the 16MB stack — a 3.1MB chunk measured 17.5MB (r4), so
    # only chunks <= 2.5MB are safe
    if nz * 8 * _lanes(smallest) * 4 <= (5 << 19):
        return smallest
    return None


def _xy_kernel(in_ref, xt_ref, xb_ref, out_ref, xscr,
               *, taps, x_meta, rows, nx):
    """X pass (lane conv, boundary-exact) into a sublane-halo-padded
    scratch, then the Y interior pass as sublane-shifted tap FMAs."""
    f32 = jnp.float32
    width = len(taps)
    hw = (width - 1) // 2
    padh = _round8(hw)
    n_top, bot_start = x_meta
    n_int = nx - 2 * hw - 1

    rc = _ROWS
    while rows % rc:
        rc //= 2
    rc = max(rc, 1)

    def xbody(i, _):
        r0 = pl.multiple_of(i * rc, 8)
        chunk = in_ref[pl.ds(r0, rc), :]
        w0 = pl.multiple_of(r0 + padh, 8)
        if n_int > 0:
            acc = f32(taps[0]) * chunk[:, 2 * hw: 2 * hw + n_int]
            for j in range(1, width):
                acc = acc + f32(taps[j]) * chunk[:, 2 * hw - j: 2 * hw - j + n_int]
            xscr[pl.ds(w0, rc), hw: hw + n_int] = acc
        if n_top > 0:
            xscr[pl.ds(w0, rc), :n_top] = jax.lax.dot_general(
                chunk, xt_ref[:], (((1,), (1,)), ((), ())), **_DOT_KW
            )
        if bot_start < nx:
            xscr[pl.ds(w0, rc), bot_start:] = jax.lax.dot_general(
                chunk, xb_ref[:], (((1,), (1,)), ((), ())), **_DOT_KW
            )
        return 0

    jax.lax.fori_loop(0, rows // rc, xbody, 0)

    # Y interior: out[r] = sum_j taps[j] * x[r + hw - j]. Rows whose y lies
    # in the boundary bands get cross-plane garbage here; the caller
    # overwrites those bands with the exact boundary-matrix values.
    def ybody(i, _):
        r0 = pl.multiple_of(i * rc, 8)
        val = xscr[pl.ds(r0, rc + 2 * padh), :]
        acc = f32(taps[0]) * val[padh + hw: padh + hw + rc, :]
        for j in range(1, width):
            off = padh + hw - j
            acc = acc + f32(taps[j]) * val[off: off + rc, :]
        out_ref[pl.ds(r0, rc), :] = acc
        return 0

    jax.lax.fori_loop(0, rows // rc, ybody, 0)


def _z_kernel(in_ref, out_ref, *, taps, nz):
    """Z interior pass on (nz, 8, nx) blocks: taps shift the untiled major
    dim, moving whole (8, nx) register planes. Chunked over output rows
    with a fori_loop so the unrolled tap temps stay small (each unrolled
    `acc + term` materialises its RHS on the 16MB scoped-vmem stack).
    Boundary z rows are overwritten by the caller."""
    f32 = jnp.float32
    width = len(taps)
    hw = (width - 1) // 2
    n_int = nz - 2 * hw - 1
    if n_int <= 0:
        out_ref[...] = in_ref[...]
        return

    rc = min(64, n_int)
    nfull = n_int // rc

    def chunk(r0_static_or_traced, size):
        # out row hw+r0+t = sum_j taps[j] * in[r0 + t + 2hw - j]
        val = in_ref[pl.ds(r0_static_or_traced, size + 2 * hw)]
        acc = f32(taps[0]) * val[2 * hw: 2 * hw + size]
        for j in range(1, width):
            acc = acc + f32(taps[j]) * val[2 * hw - j: 2 * hw - j + size]
        return acc

    def body(i, _):
        r0 = i * rc
        out_ref[pl.ds(hw + r0, rc)] = chunk(r0, rc)
        return 0

    jax.lax.fori_loop(0, nfull, body, 0)
    rem = n_int - nfull * rc
    if rem:
        out_ref[pl.ds(hw + nfull * rc, rem)] = chunk(nfull * rc, rem)
    # fill the boundary rows with anything in-range (overwritten outside)
    out_ref[:hw] = in_ref[:hw]
    out_ref[nz - hw - 1:] = in_ref[nz - hw - 1:]


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def gaussian_blur_pallas2(vol: jnp.ndarray, sigma: float,
                          interpret: bool = False):
    """Separable blur, reference axis order X -> Y -> Z, boundary-exact,
    streaming (one read + one write per pass). Requires ny % 8 == 0."""
    nz, ny, nx = vol.shape
    # NOTE: a lane-strided-slice producer fused into the flat reshape below
    # lowers as a ~26 ms linear gather of the whole level; downsample()
    # therefore decimates x with a selection matmul (ops/gaussian.py). An
    # optimization_barrier here does NOT prevent the bad fusion (measured).
    k = gaussian_kernel(sigma)
    taps = tuple(float(t) for t in k)
    hw = len(k) // 2
    padh = _round8(hw)

    xt, xb, x_bs = _boundary_rows(nx, k)
    yt, yb, y_bs = _boundary_rows(ny, k)
    zt, zb, z_bs = _boundary_rows(nz, k)

    rows_total = nz * ny
    # z-slab rows per grid step: in + out double-buffered + padded scratch
    # all live on the 16MB scoped-vmem stack, so size the block at ~2MB
    # using the PADDED lane extent (a 192-lane row occupies 256 lanes)
    tz = max(1, min(nz, (2 << 20) // max(ny * _lanes(nx) * 4, 1)))
    while nz % tz:
        tz -= 1
    rows = tz * ny

    xy = pl.pallas_call(
        functools.partial(_xy_kernel, taps=taps, x_meta=(xt.shape[0], x_bs),
                          rows=rows, nx=nx),
        grid=(nz // tz,),
        in_specs=[
            pl.BlockSpec((rows, nx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(xt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(xb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, nx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_total, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * padh, nx), jnp.float32),
        ],
        interpret=interpret,
    )(vol.reshape(rows_total, nx), jnp.asarray(xt), jnp.asarray(xb))

    xy = xy.reshape(nz, ny, nx)

    # Exact y-boundary bands: same smoothing-matrix rows as the einsum
    # path, ~(2*hw+1)/ny of one full pass. Needs the X-passed volume, which
    # equals xy outside the y-interior only in the x direction — recompute
    # the X pass for the bands from the original volume via the X matrix.
    Wx = jnp.asarray(smoothing_matrix(nx, k))
    xpass_top = jnp.einsum("xj,zbj->zbx", Wx, vol[:, : 2 * hw + 1, :],
                           **_DOT_KW) if yt.shape[0] > 0 else None
    xpass_bot = jnp.einsum("xj,zbj->zbx", Wx, vol[:, ny - 2 * hw - 1:, :],
                           **_DOT_KW)
    if yt.shape[0] > 0:
        top = jnp.einsum("bj,zjx->zbx", jnp.asarray(yt[:, : 2 * hw + 1]),
                         xpass_top, **_DOT_KW)
        xy = xy.at[:, : yt.shape[0], :].set(top)
    if y_bs < ny:
        bot = jnp.einsum("bj,zjx->zbx", jnp.asarray(yb[:, ny - 2 * hw - 1:]),
                         xpass_bot, **_DOT_KW)
        xy = xy.at[:, y_bs:, :].set(bot)

    # Z pass: (nz, 8, nx_c) blocks over (y, x). The lane chunk keeps
    # in+out blocks plus tap temps inside the 16MB scoped-vmem budget at
    # 512^3 (a full (512, 8, 512) block is 8MB and doubles on the stack).
    # Chunk legality (divides nx, 128-multiple or full) is pre-checked by
    # gaussian.py's gate; assert rather than crash inside Mosaic.
    nx_c = z_lane_chunk(nz, nx)
    assert nx_c is not None, (nz, nx)
    zout = pl.pallas_call(
        functools.partial(_z_kernel, taps=taps, nz=nz),
        grid=(ny // 8, nx // nx_c),
        in_specs=[
            pl.BlockSpec((nz, 8, nx_c), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nz, 8, nx_c), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        interpret=interpret,
    )(xy)

    # Exact z-boundary bands.
    if zt.shape[0] > 0:
        top = jnp.einsum("bj,jyx->byx", jnp.asarray(zt[:, : 2 * hw + 1]),
                         xy[: 2 * hw + 1], **_DOT_KW)
        zout = zout.at[: zt.shape[0]].set(top)
    if z_bs < nz:
        bot = jnp.einsum("bj,jyx->byx", jnp.asarray(zb[:, nz - 2 * hw - 1:]),
                         xy[nz - 2 * hw - 1:], **_DOT_KW)
        zout = zout.at[z_bs:].set(bot)
    return zout
