"""Multi-host initialisation and mesh construction.

BASELINE configs 4-5 call for N >= 2 hosts. The single-process reference has
no equivalent; on TPU pods the recipe is:

1. every host process calls `initialize()` (jax.distributed) with the
   coordinator address — on Cloud TPU pod slices arguments are discovered
   automatically;
2. build one global mesh over all devices; intra-host/intra-slice axes ride
   ICI, the cross-host axis rides DCN;
3. the z-block volume sharding (parallel/sharded.py) and the edge-sharded
   pose-graph solver work unchanged over the global mesh: GSPMD emits
   DCN-aware collectives from the same sharding annotations.

Only a single chip is reachable in this development environment; this
module is exercised by the virtual-device tests and documents the intended
production path.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import BLOCK_AXIS, Y_AXIS, mesh_zy


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the jax.distributed runtime (no-op if single-process)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_block_mesh() -> Mesh:
    """1-D z-block mesh over every device of every host, ordered so that
    devices of one host are contiguous: halo exchanges between neighbouring
    blocks then stay on ICI except at host boundaries."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (BLOCK_AXIS,))


def global_block_mesh2d(ny_shards: int) -> Mesh:
    """2-D (z x y) global mesh: one host's devices fill whole z-rows of the
    mesh, so only the z axis crosses host boundaries — z-halo exchanges at
    host edges ride DCN while every y-halo stays intra-host (ICI)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devs)
    if n % ny_shards != 0:
        raise ValueError(f"{n} devices not divisible by ny_shards={ny_shards}")
    nz_shards = n // ny_shards
    per_host = n // jax.process_count()
    if per_host % ny_shards != 0:
        raise ValueError(
            f"per-host device count {per_host} not divisible by "
            f"ny_shards={ny_shards}: a host's devices must fill whole "
            f"z-rows so y-halos stay intra-host")
    return Mesh(np.array(devs).reshape(nz_shards, ny_shards),
                (BLOCK_AXIS, Y_AXIS))


def host_local_slice(global_array_shape, mesh: Mesh):
    """The (start, size) z-range of this host's shard group for feeding
    per-host input pipelines (each host loads only its own slab). On a 2-D
    mesh a host owns whole z-rows (global_block_mesh2d ordering), so the
    slice is still a contiguous z-range."""
    n_z, _ = mesh_zy(mesh)
    nz = global_array_shape[0]
    if nz % n_z != 0:
        raise ValueError(
            f"z extent {nz} not divisible by z-shard count {n_z}; pad the "
            f"volume (or choose a mesh) so every device gets an equal slab")
    per = nz // n_z
    procs = jax.process_count()
    if n_z % procs != 0:
        raise ValueError(
            f"z-shard count {n_z} not divisible by process count {procs}")
    local = n_z // procs
    start = jax.process_index() * local * per
    return start, local * per
