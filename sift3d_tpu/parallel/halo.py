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


def exchange_halo(block: jnp.ndarray, halo: int, axis_name: str = BLOCK_AXIS):
    """Inside shard_map: return (lo_halo, hi_halo) slabs of depth `halo`
    gathered from the z-neighbours, zero-filled at the domain boundary.

    block: (nz_local, ny, nx). Supports halo > nz_local via multiple hops.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    nz_local = block.shape[0]

    lo = jnp.zeros((halo,) + block.shape[1:], block.dtype)
    hi = jnp.zeros((halo,) + block.shape[1:], block.dtype)

    hops = -(-halo // nz_local)
    tie = None  # chains the ppermutes into a total order (see below)
    for h in range(1, hops + 1):
        # slab from neighbour at distance h below (towards index 0)
        depth = min(nz_local, halo - (h - 1) * nz_local)
        # what we contribute to the neighbour h above us: our top `depth`
        up_send = block[-depth:] if depth < nz_local else block
        down_send = block[:depth] if depth < nz_local else block

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
        lo_start = max(halo - h * nz_local, 0)
        lo = jax.lax.dynamic_update_slice(
            lo, recv_lo[-depth:] if depth < recv_lo.shape[0] else recv_lo,
            (lo_start,) + (0,) * (block.ndim - 1),
        )
        hi_start = (h - 1) * nz_local
        hi = jax.lax.dynamic_update_slice(
            hi, recv_hi[:depth] if depth < recv_hi.shape[0] else recv_hi,
            (hi_start,) + (0,) * (block.ndim - 1),
        )
    return lo, hi


def _zpass_matrices(nz: int, n_shards: int, kernel: np.ndarray, halo: int):
    """Per-shard slices of the global z smoothing matrix.

    Shard s computes rows [s*L, (s+1)*L) of W against the column window
    [s*L - halo, (s+1)*L + halo) (clipped columns are provably zero because
    every tap reaches at most hw+1 <= halo source rows away).
    Returns (n_shards, L, L + 2*halo) float32.
    """
    W = smoothing_matrix(nz, kernel)
    L = nz // n_shards
    out = np.zeros((n_shards, L, L + 2 * halo), np.float32)
    for s in range(n_shards):
        r0 = s * L
        c0 = r0 - halo
        for j in range(L + 2 * halo):
            c = c0 + j
            if 0 <= c < nz:
                out[s, :, j] = W[r0 : r0 + L, c]
    # correctness: no mass outside the window
    for s in range(n_shards):
        r0 = s * L
        lost = np.abs(W[r0 : r0 + L, : max(r0 - halo, 0)]).sum() + np.abs(
            W[r0 : r0 + L, r0 + L + halo :]
        ).sum()
        if lost > 0:
            raise ValueError(
                f"halo {halo} too small for kernel width {len(kernel)}"
            )
    return out


@functools.lru_cache(maxsize=None)
def _zpass_matrices_cached(nz, n_shards, sigma, halo):
    return _zpass_matrices(nz, n_shards, gaussian_kernel(sigma), halo)


def sharded_gaussian_blur(vol: jnp.ndarray, sigma: float, mesh: Mesh):
    """Separable blur on a z-block-sharded volume.

    X and Y passes are purely local matmuls; the Z pass exchanges hw+1-deep
    halos with ppermute and applies per-shard slices of the global smoothing
    matrix, reproducing the reference boundary math bit-for-bit with the
    single-device path.
    """
    nz, ny, nx = vol.shape
    n_shards = mesh.devices.size
    assert nz % n_shards == 0, "z dim must divide the mesh for the halo path"

    kernel = gaussian_kernel(sigma)
    hw = len(kernel) // 2
    # Interior rows reach +-hw columns; boundary rows' mirrored taps stay
    # within hw+1 of the domain edge, i.e. inside the edge shards themselves
    # whenever L >= hw+2, and inside halo+block otherwise. _zpass_matrices
    # validates that no kernel mass falls outside the window and raises if
    # the halo must be widened.
    halo = max(hw, 1)
    if nz // n_shards < hw + 2:
        halo = hw + 2  # tiny blocks: mirrored taps may cross shards

    Wz_shards = jnp.asarray(_zpass_matrices_cached(nz, n_shards, float(sigma), halo))
    Wy = jnp.asarray(smoothing_matrix(ny, kernel))
    Wx = jnp.asarray(smoothing_matrix(nx, kernel))
    hi_prec = jax.lax.Precision.HIGHEST

    def f(block, Wz_local):
        # local X then Y passes
        out = jnp.einsum("xj,zyj->zyx", Wx, block,
                         preferred_element_type=jnp.float32, precision=hi_prec)
        out = jnp.einsum("yj,zjx->zyx", Wy, out,
                         preferred_element_type=jnp.float32, precision=hi_prec)
        # halo exchange + local Z matmul
        lo, hi = exchange_halo(out, halo)
        ext = jnp.concatenate([lo, out, hi], axis=0)  # (L + 2*halo, ny, nx)
        out = jnp.einsum("zj,jyx->zyx", Wz_local[0], ext,
                         preferred_element_type=jnp.float32, precision=hi_prec)
        return out

    spec_v = P(BLOCK_AXIS, None, None)
    spec_w = P(BLOCK_AXIS, None, None)
    return shard_map(
        f, mesh=mesh,
        in_specs=(spec_v, spec_w),
        out_specs=spec_v,
    )(vol, Wz_shards)
