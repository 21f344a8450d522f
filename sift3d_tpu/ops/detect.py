"""DoG keypoint detection: threshold + strict 8-neighbour extremum test.

TPU design: the reference's serial triple loop (Detect_KeyPoints,
Src/cSIFT3D.cc:362-425) becomes a fully vectorised mask computation —
shifted-slice comparisons against the 6 face neighbours in-level plus the
centre voxel of the previous/next DoG level (IsExtrema_neighbor,
Src/cSIFT3D.cc:884-911) — followed by a fixed-capacity compaction
(jnp.nonzero with static size), because TPU kernels need static shapes.
Compaction order is row-major (z, y, x), identical to the reference's scan
order, so downstream keypoint ordering matches the CPU oracle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _use_pallas_compact(flag=None) -> bool:
    if flag is not None:
        return flag
    return jax.default_backend() == "tpu"


class LevelDetections(NamedTuple):
    """Fixed-capacity keypoint set for one (octave, level)."""

    x: jnp.ndarray       # (cap,) int32, level coords
    y: jnp.ndarray       # (cap,) int32
    z: jnp.ndarray       # (cap,) int32
    valid: jnp.ndarray   # (cap,) bool
    count: jnp.ndarray   # () int32 — true number of extrema (may exceed cap)
    threshold: jnp.ndarray  # () f32 — peak_thresh * max|DoG|


def extrema_mask(
    prev: jnp.ndarray, cur: jnp.ndarray, nxt: jnp.ndarray, peak_thresh: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Boolean mask over interior voxels (border IMG_BORDER=1 excluded).

    Returns (mask of shape (nz-2, ny-2, nx-2), threshold scalar).
    """
    thres = jnp.float32(peak_thresh) * jnp.max(jnp.abs(cur))
    c = cur[1:-1, 1:-1, 1:-1]
    passed = (c > thres) | (c < -thres)

    neigh = (
        prev[1:-1, 1:-1, 1:-1],
        cur[1:-1, 1:-1, :-2],
        cur[1:-1, 1:-1, 2:],
        cur[1:-1, 2:, 1:-1],
        cur[1:-1, :-2, 1:-1],
        cur[2:, 1:-1, 1:-1],
        cur[:-2, 1:-1, 1:-1],
        nxt[1:-1, 1:-1, 1:-1],
    )
    is_min = passed
    is_max = passed
    for nb in neigh:
        is_min = is_min & (c < nb)
        is_max = is_max & (c > nb)
    return is_min | is_max, thres


def compact(mask: jnp.ndarray, cap: int, threshold: jnp.ndarray,
            use_pallas=None) -> LevelDetections:
    """Compact a (nz-2, ny-2, nx-2) interior mask into fixed-cap coords.

    Indices come out in C row-major order = the reference's z,y,x scan.
    Coordinates are shifted by +1 back into full-volume space.

    Implementation note: jnp.nonzero lowers to a full sort (13.8ms device
    for 2M voxels on v5e); top_k over negated position keys returns the
    same first-`cap` ascending set-bit positions in 2.7ms, and a count
    guard skips even that for empty levels (most levels are empty).
    """
    mz, my, mx = mask.shape
    flat = mask.ravel()
    n = flat.shape[0]
    count = jnp.sum(flat.astype(jnp.int32))

    k = min(cap, n)  # tiny top levels may have fewer voxels than cap

    def do_compact(flat):
        # The Pallas compaction writes its s32[cap] index output through
        # SMEM (scalar stores at dynamic indices are SMEM-only), and SMEM
        # is 1 MB: Mosaic rejected cap=524288 (2 MB) at r5. Gate at the
        # proven 131072 (512 KB) and use the bit-identical XLA top_k
        # compaction for larger explicit caps.
        if _use_pallas_compact(use_pallas) and cap * 4 <= (1 << 19):
            from .pallas.compact_kernel import CTILE, compact_mask_pallas

            npad = -(-n // CTILE) * CTILE
            raw = compact_mask_pallas(
                jnp.pad(flat, (0, npad - n)), cap,
                interpret=jax.default_backend() != "tpu",
            )
            lanes = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
            return jnp.where(lanes < count, raw, -1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        keys = jnp.where(flat, pos, jnp.int32(2 ** 30))
        vv, ii = jax.lax.top_k(-keys, k)
        idx = jnp.where(vv > -(2 ** 30), ii, -1).astype(jnp.int32)
        return jnp.pad(idx, (0, cap - k), constant_values=-1)

    idx = jax.lax.cond(
        count > 0,
        do_compact,
        lambda flat: jnp.full((cap,), -1, jnp.int32),
        flat,
    )
    valid = idx >= 0
    safe = jnp.maximum(idx, 0)
    z = safe // (my * mx)
    rem = safe % (my * mx)
    y = rem // mx
    x = rem % mx
    return LevelDetections(
        x=jnp.where(valid, x + 1, 0).astype(jnp.int32),
        y=jnp.where(valid, y + 1, 0).astype(jnp.int32),
        z=jnp.where(valid, z + 1, 0).astype(jnp.int32),
        valid=valid,
        count=count,
        threshold=threshold,
    )


def decode_indices(idx, count, threshold, shape) -> LevelDetections:
    """(cap,) flat interior positions + count -> LevelDetections (the same
    decode as `compact`, shared by the fused detection kernel)."""
    nz, ny, nx = shape
    my, mx = ny - 2, nx - 2
    cap = idx.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
    valid = lanes < jnp.minimum(count, cap)
    safe = jnp.where(valid, idx, 0)
    z = safe // (my * mx)
    rem = safe % (my * mx)
    y = rem // mx
    x = rem % mx
    return LevelDetections(
        x=jnp.where(valid, x + 1, 0).astype(jnp.int32),
        y=jnp.where(valid, y + 1, 0).astype(jnp.int32),
        z=jnp.where(valid, z + 1, 0).astype(jnp.int32),
        valid=valid,
        count=count,
        threshold=threshold,
    )


def detect_level(
    prev: jnp.ndarray,
    cur: jnp.ndarray,
    nxt: jnp.ndarray,
    peak_thresh: float,
    cap: int,
    use_pallas=None,
) -> LevelDetections:
    # The fused kernel holds ~9-10 (ny, nx) planes on the 16MB scoped-vmem
    # stack (5 unit-z blocks double-buffered + roll temps): a 768^2 plane
    # (2.36MB) measured 22.5MB and was rejected by Mosaic (r5). Gate on the
    # plane size that keeps the stack under budget — 512^2 (1.05MB, ~10MB
    # stack) is the largest measured-good plane; larger planes use the XLA
    # mask + Pallas compaction path (bit-identical results).
    fits_vmem = cur.shape[1] * cur.shape[2] * 4 <= (1 << 20) + (1 << 16)
    fits_smem = cap * 4 <= (1 << 19)  # s32[cap] idx output lives in SMEM
    if (_use_pallas_compact(use_pallas) and jax.default_backend() == "tpu"
            and fits_vmem and fits_smem):
        from .pallas.detect_kernel import detect_level_pallas

        idx, count, thres = detect_level_pallas(
            prev, cur, nxt, peak_thresh, cap
        )
        return decode_indices(idx, count, thres, cur.shape)
    mask, thres = extrema_mask(prev, cur, nxt, peak_thresh)
    return compact(mask, cap, thres, use_pallas)
