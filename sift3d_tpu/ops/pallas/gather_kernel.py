"""Pallas DMA window gather — batched keypoint window extraction.

XLA lowers the vmapped dynamic_slice window gather (ops/windows.py) to one
small dynamic-update-slice per keypoint inside the kp-block while loop:
measured ~105 ms of the 256^3 pair (5856 x f32[32,51,51,51] DUS at ~6.5 us
each — launch-overhead-bound, ~80 GB/s effective). This kernel issues one
strided HBM->HBM DMA per keypoint from the padded level straight into the
(B, Wz, Wy, Wx) batch buffer instead; the DMA engine handles the stride,
and grid steps pipeline the copies.

The result is bit-identical to the XLA gather (it is a copy), so swapping
implementations cannot change any downstream value.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(sz_ref, sy_ref, sx_ref, vol_ref, out_ref, sem, *, wshape):
    Wz, Wy, Wx = wshape
    b = pl.program_id(0)
    pltpu.make_async_copy(
        vol_ref.at[
            pl.ds(sz_ref[b], Wz), pl.ds(sy_ref[b], Wy), pl.ds(sx_ref[b], Wx)
        ],
        out_ref.at[b],
        sem,
    ).start()
    pltpu.make_async_copy(
        vol_ref.at[
            pl.ds(sz_ref[b], Wz), pl.ds(sy_ref[b], Wy), pl.ds(sx_ref[b], Wx)
        ],
        out_ref.at[b],
        sem,
    ).wait()


@functools.partial(jax.jit, static_argnames=("wshape", "interpret"))
def gather_windows_pallas(vol_padded, sz, sy, sx, wshape,
                          interpret: bool = False):
    """(B, Wz, Wy, Wx) windows copied from `vol_padded` at per-keypoint
    starts (already clamped in-bounds and z_off-adjusted by the caller)."""
    B = sz.shape[0]
    Wz, Wy, Wx = wshape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        functools.partial(_kernel, wshape=wshape),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Wz, Wy, Wx), jnp.float32),
        interpret=interpret,
    )(sz.astype(jnp.int32), sy.astype(jnp.int32), sx.astype(jnp.int32),
      vol_padded)
