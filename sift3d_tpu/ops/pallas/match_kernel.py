"""Pallas TPU kernel: brute-force top-2 descriptor scores, tiled.

The XLA matcher (ops/match.py top2_scores) materialises (row_chunk, M)
score matrices to HBM and re-reads them for max/argmax/scatter — at
50k x 50k that is ~50 GB of score traffic and ~490 ms on v5e. This kernel
keeps each (RN, CM) score tile in VMEM and folds it into per-row running
top-2 state immediately, so HBM traffic is just the two descriptor arrays:

    scores = ref_tile (RN, 768) @ tar_tile^T (768, CM)   on the MXU,
    running (d1, i1, d2) merge                           on the VPU.

Semantics replicate calMatches (reference Src/cMatcher.cc:54-77): strict
`>` updates so the earliest target index wins ties, d2 excludes only the
d1 *occurrence* (not equal values), FLT_MIN initialisation. Invalid
targets are masked to -inf and can never be selected.

Grid: (row blocks, col blocks), col minor; the three outputs are the
running state, initialised at cb == 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RN = 256    # ref rows per tile
CM = 1024   # tar cols per tile

_FLT_MIN = 1.175494351e-38
_NEG = float("-inf")


def _kernel(
    ref_ref,    # (RN, D) f32
    tar_ref,    # (CM, D) f32
    msk_ref,    # (1, CM) f32 additive mask (0 valid / -inf invalid)
    d1_ref, i1_ref, d2_ref,   # (1, RN) running state
    *,
    precision,
):
    cb = pl.program_id(1)

    @pl.when(cb == 0)
    def _():
        d1_ref[...] = jnp.full((1, RN), jnp.float32(_FLT_MIN))
        d2_ref[...] = jnp.full((1, RN), jnp.float32(_FLT_MIN))
        i1_ref[...] = jnp.full((1, RN), -1, jnp.int32)

    if precision == jax.lax.Precision.HIGH:
        # Mosaic lowers only DEFAULT/HIGHEST; HIGH (3 bf16 passes) is the
        # standard f32 split a@b ~= ah@bh + ah@bl + al@bh with x = xh + xl,
        # xh = bf16(x) — drops only the ll term. bf16 has 8 mantissa bits,
        # so each residual is ~2^-8 of its operand and the dropped product
        # is ~2^-16 relative (plus ~2^-16 from rounding the residuals to
        # bf16) — well inside the match parity tolerance.
        a = ref_ref[...]
        b = tar_ref[...]
        ah = a.astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        dims = (((1,), (1,)), ((), ()))

        def mm(x, y):
            return jax.lax.dot_general(
                x, y, dims, preferred_element_type=jnp.float32,
            )

        scores = mm(ah, bl) + mm(al, bh) + mm(ah, bh)
    else:
        scores = jax.lax.dot_general(
            ref_ref[...], tar_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    scores = scores + msk_ref[0][None, :]          # (RN, CM)

    col = jax.lax.broadcasted_iota(jnp.int32, (RN, CM), 1)
    t1 = jnp.max(scores, axis=1)                          # (RN,)
    # first (lowest-index) occurrence of the max, reference tie order
    ti = jnp.min(jnp.where(scores == t1[:, None], col, CM), axis=1)
    masked = jnp.where(col == ti[:, None], jnp.float32(_NEG), scores)
    t2 = jnp.max(masked, axis=1)

    gi = ti.astype(jnp.int32) + cb * CM

    d1 = d1_ref[0]
    d2 = d2_ref[0]
    i1 = i1_ref[0]
    upd = t1 > d1
    new_d1 = jnp.where(upd, t1, d1)
    new_i1 = jnp.where(upd, gi, i1)
    new_d2 = jnp.where(upd, jnp.maximum(d1, t2), jnp.maximum(d2, t1))
    d1_ref[...] = new_d1[None, :]
    i1_ref[...] = new_i1[None, :]
    d2_ref[...] = new_d2[None, :]


@functools.partial(jax.jit, static_argnames=("precision", "interpret"))
def top2_scores_pallas(
    ref_desc,    # (N, D) f32, N % RN == 0
    tar_desc,    # (M, D) f32, M % CM == 0
    tar_mask,    # (M,) f32 additive mask (0 valid / -inf invalid)
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
):
    """Returns (s1, s2, i1): best/second dot products and best index
    (global, tie-broken to the lowest index) per ref row."""
    N, D = ref_desc.shape
    M, _ = tar_desc.shape
    assert N % RN == 0 and M % CM == 0

    kernel = functools.partial(_kernel, precision=precision)
    grid = (N // RN, M // CM)

    s1, i1, s2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RN, D), lambda rb, cb: (rb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CM, D), lambda rb, cb: (cb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CM), lambda rb, cb: (0, cb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RN), lambda rb, cb: (0, rb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RN), lambda rb, cb: (0, rb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RN), lambda rb, cb: (0, rb),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
        ],
        interpret=interpret,
    )(ref_desc, tar_desc, tar_mask[None, :])
    return s1[0], s2[0], i1[0]
