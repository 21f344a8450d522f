"""Explicit halo exchange over the device mesh (shard_map + ppermute).

The hand-optimised communication path for block-partitioned stencil stages:
each device owns a contiguous z-slab of the volume; stencils (Gaussian taps,
the DoG extremum test, keypoint windows) reach up to H voxels past the slab
boundary, so neighbours exchange H-deep halo slabs over ICI with
jax.lax.ppermute. Halos wider than one slab are fetched with multiple
ring hops.

This is the volumetric analogue of context-parallel block exchange; XLA's
GSPMD partitioner can derive equivalent (usually all-gather-based)
communication from sharding annotations alone — this module exists to do
strictly-neighbour ppermute transfers instead, which ride ICI neighbour
links instead of all-gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import BLOCK_AXIS
from ..pyramid import gaussian_kernel, smoothing_matrix


def exchange_halo(block: jnp.ndarray, halo: int, axis_name: str = BLOCK_AXIS,
                  dim: int = 0):
    """Inside shard_map: return (lo_halo, hi_halo) slabs of depth `halo`
    along array axis `dim`, gathered from the mesh neighbours on
    `axis_name`, zero-filled at the domain boundary.

    Supports halo > the local extent via multiple ring hops. `dim != 0`
    (e.g. y-halos on a 2-D z x y mesh) slices along that axis directly —
    no transposes.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    nz_local = block.shape[dim]

    hshape = list(block.shape)
    hshape[dim] = halo
    lo = jnp.zeros(tuple(hshape), block.dtype)
    hi = jnp.zeros(tuple(hshape), block.dtype)

    def take(a, start, size):
        return jax.lax.slice_in_dim(a, start, start + size, axis=dim)

    hops = -(-halo // nz_local)
    tie = None  # chains the ppermutes into a total order (see below)
    for h in range(1, hops + 1):
        # slab from neighbour at distance h below (towards index 0)
        depth = min(nz_local, halo - (h - 1) * nz_local)
        # what we contribute to the neighbour h above us: our top `depth`
        up_send = take(block, nz_local - depth, depth)
        down_send = take(block, 0, depth)

        # Serialize the permutes with value-preserving barriers: XLA's CPU
        # thunk executor may start independent collectives in different
        # orders on different devices and deadlock the rendezvous; a fixed
        # total order costs nothing on the TPU stream.
        if tie is not None:
            up_send, _ = jax.lax.optimization_barrier((up_send, tie))
        # send up: device i -> i+h  (receives from i-h): provides lo halo
        recv_lo = jax.lax.ppermute(
            up_send, axis_name, [(i, i + h) for i in range(n - h)]
        )
        down_send, _ = jax.lax.optimization_barrier((down_send, recv_lo))
        # send down: device i -> i-h (receives from i+h): provides hi halo
        recv_hi = jax.lax.ppermute(
            down_send, axis_name, [(i, i - h) for i in range(h, n)]
        )
        tie = recv_hi
        have_lo = idx >= h
        have_hi = idx < n - h
        recv_lo = jnp.where(have_lo, recv_lo, 0.0)
        recv_hi = jnp.where(have_hi, recv_hi, 0.0)

        # place into halo buffers: hop h fills rows [halo - h*nz_local ...]
        def put(buf, val, start):
            st = [0] * block.ndim
            st[dim] = start
            return jax.lax.dynamic_update_slice(buf, val, tuple(st))

        lo_start = max(halo - h * nz_local, 0)
        lo = put(
            lo,
            take(recv_lo, recv_lo.shape[dim] - depth, depth)
            if depth < recv_lo.shape[dim] else recv_lo,
            lo_start,
        )
        hi_start = (h - 1) * nz_local
        hi = put(
            hi,
            take(recv_hi, 0, depth) if depth < recv_hi.shape[dim] else recv_hi,
            hi_start,
        )
    return lo, hi


def _zpass_matrices(nz: int, n_shards: int, kernel: np.ndarray, halo: int,
                    nz_pad: int | None = None):
    """Per-shard slices of the global axis smoothing matrix.

    Shard s computes rows [s*L, (s+1)*L) of W against the column window
    [s*L - halo, (s+1)*L + halo) (clipped columns are provably zero because
    every tap reaches at most hw+1 <= halo source rows away).
    Returns (n_shards, L, L + 2*halo) float32.

    `nz_pad` (>= nz, divisible by n_shards) supports PADDED sharding of a
    non-divisible axis: the matrix is built from the TRUE extent nz, rows
    >= nz are zero (padded output rows stay exactly 0, like the
    single-chip zero halo), and columns >= nz never contribute, so padded
    input rows are never read.
    """
    nz_pad = nz_pad or nz
    W = smoothing_matrix(nz, kernel)
    L = nz_pad // n_shards
    out = np.zeros((n_shards, L, L + 2 * halo), np.float32)
    for s in range(n_shards):
        r0 = s * L
        c0 = r0 - halo
        for j in range(L + 2 * halo):
            c = c0 + j
            if 0 <= c < nz:
                rows = min(L, max(nz - r0, 0))
                out[s, :rows, j] = W[r0 : r0 + rows, c]
    # correctness: no mass outside the window
    for s in range(n_shards):
        r0 = s * L
        rows = min(L, max(nz - r0, 0))
        lost = np.abs(W[r0 : r0 + rows, : max(r0 - halo, 0)]).sum() + np.abs(
            W[r0 : r0 + rows, r0 + L + halo :]
        ).sum()
        if lost > 0:
            raise ValueError(
                f"halo {halo} too small for kernel width {len(kernel)}"
            )
    return out


@functools.lru_cache(maxsize=None)
def _zpass_matrices_cached(nz, n_shards, sigma, halo, nz_pad=None):
    return _zpass_matrices(nz, n_shards, gaussian_kernel(sigma), halo, nz_pad)


def _axis_halo(n: int, n_shards: int, hw: int) -> int:
    """Halo depth for one blurred axis: interior rows reach +-hw columns;
    boundary rows' mirrored taps stay within hw+1 of the domain edge, i.e.
    inside the edge shards themselves whenever L >= hw+2, and inside
    halo+block otherwise. _zpass_matrices validates that no kernel mass
    falls outside the window and raises if the halo must be widened."""
    if n // n_shards < hw + 2:
        return hw + 2  # tiny blocks: mirrored taps may cross shards
    return max(hw, 1)


def sharded_gaussian_blur(vol: jnp.ndarray, sigma: float, mesh: Mesh,
                          true_zy: tuple[int, int] | None = None):
    """Separable blur on a block-sharded volume (z blocks, or z x y blocks
    on a 2-D mesh).

    The X pass is a purely local matmul; each sharded axis (Z always, Y on
    a 2-D mesh) exchanges hw+1-deep halos with ppermute and applies
    per-shard slices of the global smoothing matrix, reproducing the
    reference boundary math bit-for-bit with the single-device path.

    `true_zy`: the TRUE (nz, ny) when `vol` is zero-padded up to mesh
    divisibility (parallel/sharded_pallas.py) — the smoothing matrices are
    built from the true extents, so padded rows stay exactly zero and
    never contribute.
    """
    from .mesh import Y_AXIS, mesh_zy

    nz, ny, nx = vol.shape
    nzt, nyt = true_zy or (nz, ny)
    n_z, n_y = mesh_zy(mesh)
    assert nz % n_z == 0, "padded z dim must divide the mesh"
    assert ny % n_y == 0, "padded y dim must divide the mesh"

    kernel = gaussian_kernel(sigma)
    hw = len(kernel) // 2
    halo_z = _axis_halo(nz, n_z, hw)
    halo_y = _axis_halo(ny, n_y, hw)

    Wz_shards = jnp.asarray(_zpass_matrices_cached(
        nzt, n_z, float(sigma), halo_z, nz if nz != nzt else None))
    Wx = jnp.asarray(smoothing_matrix(nx, kernel))
    hi_prec = jax.lax.Precision.HIGHEST
    two_d = n_y > 1
    if two_d:
        Wy_shards = jnp.asarray(_zpass_matrices_cached(
            nyt, n_y, float(sigma), halo_y, ny if ny != nyt else None))
    else:
        assert ny == nyt
        Wy_full = jnp.asarray(smoothing_matrix(ny, kernel))

    def f(block, Wz_local, Wy_local):
        # local X pass
        out = jnp.einsum("xj,zyj->zyx", Wx, block,
                         preferred_element_type=jnp.float32, precision=hi_prec)
        # Y pass: local matmul (1-D mesh) or y-halo exchange + per-shard
        # matrix slice (2-D mesh)
        if two_d:
            lo, hi = exchange_halo(out, halo_y, Y_AXIS, dim=1)
            ext = jnp.concatenate([lo, out, hi], axis=1)
            out = jnp.einsum("yj,zjx->zyx", Wy_local[0], ext,
                             preferred_element_type=jnp.float32,
                             precision=hi_prec)
        else:
            out = jnp.einsum("yj,zjx->zyx", Wy_local, out,
                             preferred_element_type=jnp.float32,
                             precision=hi_prec)
        # z-halo exchange + local Z matmul (depends on the y output, so the
        # two exchanges are naturally ordered)
        lo, hi = exchange_halo(out, halo_z)
        ext = jnp.concatenate([lo, out, hi], axis=0)  # (L + 2*halo, ., nx)
        out = jnp.einsum("zj,jyx->zyx", Wz_local[0], ext,
                         preferred_element_type=jnp.float32, precision=hi_prec)
        return out

    if two_d:
        spec_v = P(BLOCK_AXIS, Y_AXIS, None)
        specs_w = (P(BLOCK_AXIS, None, None), P(Y_AXIS, None, None))
        wy_arg = Wy_shards
    else:
        spec_v = P(BLOCK_AXIS, None, None)
        specs_w = (P(BLOCK_AXIS, None, None), P())
        wy_arg = Wy_full
    return shard_map(
        f, mesh=mesh,
        in_specs=(spec_v,) + specs_w,
        out_specs=spec_v,
    )(vol, Wz_shards, wy_arg)
