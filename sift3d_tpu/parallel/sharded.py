"""Multi-chip sharded extraction + matching (GSPMD annotations).

Strategy (SURVEY.md §5 long-context row, BASELINE configs 4-5):
- volumes and every pyramid level large enough to split are sharded in
  z-blocks across the mesh (with_sharding_constraint); XLA's SPMD
  partitioner inserts the halo/all-gather collectives for the stencil ops.
  (parallel/halo.py holds the hand-written ppermute halo path for the blur;
  it is numerically identical and used by the perf harness.)
- per-level max|DoG| reductions become cross-device all-reduces (pmax)
  automatically via the same annotations.
- octaves whose local z-extent would drop below `min_local` are replicated
  (small-octave work is negligible; communication would dominate).
- keypoint stages run on replicated levels; descriptors end up replicated,
  which *is* the "descriptor allgather" of the design — matching then runs
  row-parallel over query shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SiftConfig
from ..pipeline import KeypointSet, _extract_impl
from ..pyramid import PyramidPlan, make_plan
from ..ops.match import ENHANCED, match_descriptors, match_coords
from .mesh import BLOCK_AXIS, block_sharding, mesh_zy


def _constrain(mesh: Mesh, x: jnp.ndarray, min_local: int = 8):
    n_z, n_y = mesh_zy(mesh)
    nz, ny = x.shape[0], x.shape[1]
    if (nz % n_z == 0 and nz // n_z >= min_local
            and ny % n_y == 0 and ny // n_y >= min_local):
        return jax.lax.with_sharding_constraint(x, block_sharding(mesh))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))


def sharded_extract(vol: jnp.ndarray, plan: PyramidPlan, mesh: Mesh) -> KeypointSet:
    """Extraction with block sharding constraints (z, or z x y on a 2-D
    mesh) on every pyramid level."""
    from ..ops.gaussian import xla_blur

    with xla_blur():
        return _extract_impl(
            vol, plan, constrain=functools.partial(_constrain, mesh)
        )


def make_sharded_step(
    mesh: Mesh,
    shape: tuple[int, int, int],
    cfg: SiftConfig | None = None,
    threshold: float = 0.85,
):
    """jit-compiled full step: extract both volumes (z-block sharded),
    allgather descriptors (GSPMD), match row-parallel. Returns the jitted
    function and the input sharding."""
    import dataclasses

    cfg = cfg or SiftConfig()
    # Pallas kernels are single-device programs; the GSPMD partitioner can
    # shard the XLA formulations, so the sharded step forces those.
    cfg = dataclasses.replace(cfg, use_pallas=False)
    plan = make_plan(cfg, shape)
    vol_sharding = block_sharding(mesh)

    def step(ref_vol, tar_vol):
        ref = sharded_extract(ref_vol, plan, mesh)
        tar = sharded_extract(tar_vol, plan, mesh)
        res = match_descriptors(
            ref.desc, tar.desc, ref.valid, tar.valid, threshold, mode=ENHANCED
        )
        rc, tc, valid = match_coords(ref.rxyz, tar.rxyz, res)
        return {
            "ref_coords": rc,
            "tar_coords": tc,
            "match_valid": valid,
            "num_ref": ref.num_valid,
            "num_tar": tar.num_valid,
        }

    jitted = jax.jit(step, in_shardings=(vol_sharding, vol_sharding))
    return jitted, vol_sharding
