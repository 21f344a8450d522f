"""Fused DoG detection: threshold + extremum test + compaction in one pass.

The staged XLA path (ops/detect.py) runs four passes over the DoG levels
per detect level: jnp.max|cur| for the adaptive threshold
(Src/cSIFT3D.cc:384-385), the shifted-slice extremum mask
(IsExtrema_neighbor, Src/cSIFT3D.cc:884-911), a flatten/pad of the mask,
and the sparse-compaction kernel — ~28 ms of the 256^3 pair, with the
(nz-2)^3 bool mask written to and re-read from HBM in between.

This kernel does all of it in ONE pallas_call with a two-phase grid:

  phase 0: stream cur's z-planes, accumulate max|cur| in SMEM
           (max is exact and order-insensitive, so the threshold is
           bit-identical to jnp.max);
  phase 1: re-stream cur (3 planes: z-1, z, z+1 via unit-z blocks whose
           index map offsets by the grid step) with prev/next centre
           planes, build the strict 8-neighbour extremum mask in
           registers (lane/sublane rolls for the x/y face neighbours),
           and extract set positions per plane with the same per-hit
           argmin loop as compact_kernel.py, appending ascending flat
           interior positions to an SMEM output.

Plane traffic: cur 4x + prev/next 1x (vs 5 reads + mask write + mask
read staged). Output order is z-major ascending = the reference's
row-major scan order. Positions are flat indices into the
(nz-2, ny-2, nx-2) interior, the same encoding ops/detect.compact
decodes; count reports ALL hits (clamped writes at `cap`), matching the
reference's unbounded keypoint vectors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 2 ** 30


def _kernel(prev_ref, cm1_ref, cur_ref, cp1_ref, nxt_ref,
            idx_ref, cnt_ref, thr_ref, vmax_ref,
            *, peak_thresh: float, cap: int, ny: int, nx: int):
    phase = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((phase == 0) & (i == 0))
    def _():
        vmax_ref[0] = jnp.float32(0.0)
        cnt_ref[0] = 0
        cnt_ref[1] = 0

    @pl.when(phase == 0)
    def _():
        vmax_ref[0] = jnp.maximum(vmax_ref[0], jnp.max(jnp.abs(cur_ref[0])))

    @pl.when((phase == 1) & (i == 0))
    def _():
        thr_ref[0] = jnp.float32(peak_thresh) * vmax_ref[0]

    nzi = pl.num_programs(1) - 2

    @pl.when((phase == 1) & (i < nzi))
    def _():
        thres = thr_ref[0]
        c = cur_ref[0]          # (ny, nx) plane z = i+1
        sub = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
        interior = (
            (sub >= 1) & (sub <= ny - 2) & (lane >= 1) & (lane <= nx - 2)
        )
        passed = interior & ((c > thres) | (c < -thres))

        # face neighbours: x/y via rolls (edge rows/cols are masked out by
        # `interior`, so wrap-around values are never read), z via the
        # offset-indexed unit blocks.
        neigh = (
            prev_ref[0],
            pltpu.roll(c, 1, 1),      # x-1
            pltpu.roll(c, nx - 1, 1),  # x+1
            pltpu.roll(c, ny - 1, 0),  # y+1
            pltpu.roll(c, 1, 0),      # y-1
            cp1_ref[0],               # z+1
            cm1_ref[0],               # z-1
            nxt_ref[0],
        )
        is_min = passed
        is_max = passed
        for nb in neigh:
            is_min = is_min & (c < nb)
            is_max = is_max & (c > nb)
        m = is_min | is_max

        # Per-hit extraction cost is one argmin over the searched region,
        # so chunk the plane into ~16-row bands: at 512^2 planes a whole-
        # plane argmin is 2000+ VREGs per hit (measured 67 ms/level); a
        # 16-row band is ~30x cheaper and hit order stays ascending
        # (bands ascending x per-band ascending positions).
        my, mx = ny - 2, nx - 2
        base = i * (my * mx)
        pos = (sub - 1) * mx + (lane - 1)
        RC = 16
        for r0 in range(0, ny, RC):
            r1 = min(r0 + RC, ny)
            mc = m[r0:r1]
            count = jnp.sum(mc.astype(jnp.int32))

            @pl.when(count > 0)
            def _(mc=mc, count=count, r0=r0, r1=r1):
                keys0 = jnp.where(mc, pos[r0:r1], jnp.int32(BIG))

                def body(state):
                    k, keys = state
                    nxt_pos = jnp.min(keys)
                    w = cnt_ref[0]

                    @pl.when(w < cap)
                    def _():
                        idx_ref[w] = base + nxt_pos
                        cnt_ref[0] = w + 1

                    keys = jnp.where(keys == nxt_pos, jnp.int32(BIG), keys)
                    return k + 1, keys

                jax.lax.while_loop(
                    lambda s: s[0] < count, body, (jnp.int32(0), keys0)
                )
                cnt_ref[1] = cnt_ref[1] + count


@functools.partial(jax.jit, static_argnames=("peak_thresh", "cap", "interpret"))
def detect_level_pallas(prev, cur, nxt, peak_thresh: float, cap: int,
                        interpret: bool = False):
    """Fused detection for one DoG level triple.

    Returns (idx, count, threshold): idx (cap,) int32 ascending flat
    interior positions (lanes beyond min(count, cap) unspecified — mask
    with the count, as ops/detect.compact does), count () int32 = ALL
    extrema found, threshold () f32.
    """
    nz, ny, nx = cur.shape
    nzi = max(nz - 2, 1)

    kernel = functools.partial(
        _kernel, peak_thresh=float(peak_thresh), cap=cap, ny=ny, nx=nx,
    )

    # Grid (2, nz): phase 0 maxes over every cur plane; phase 1 runs the
    # interior planes z = i+1 for i < nz-2 (trailing steps masked in the
    # kernel; their fetch indices are clamped in-bounds below).
    def clamp(v):
        return jnp.clip(v, 0, nz - 1)

    def center(p, i):
        # phase 0 parks the ref on plane 0 (fetched once); phase 1 walks
        # the interior planes.
        return (jnp.where(p == 0, 0, clamp(i + 1)), 0, 0)

    plane = lambda fn: pl.BlockSpec((1, ny, nx), fn, memory_space=pltpu.VMEM)
    idx, cnt, thr = pl.pallas_call(
        kernel,
        grid=(2, nz),
        in_specs=[
            plane(center),                                            # prev
            plane(lambda p, i: (jnp.where(p == 0, 0, clamp(i)), 0, 0)),       # cur z-1
            plane(lambda p, i: (jnp.where(p == 0, i, clamp(i + 1)), 0, 0)),   # cur z
            plane(lambda p, i: (jnp.where(p == 0, 0, clamp(i + 2)), 0, 0)),   # cur z+1
            plane(center),                                            # nxt
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cap,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(prev, cur, cur, cur, nxt)
    return idx, cnt[1], thr[0]
