"""Device mesh helpers for multi-chip / multi-host execution.

The reference is single-process OpenMP (SURVEY.md §2: no distributed layer);
this module is new design territory. The volumetric analogue of sequence
parallelism: volumes are block-partitioned along z across a 1-D device mesh
("blk" axis); stencil stages exchange halos over ICI; descriptor sets are
allgathered for cross-host matching.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BLOCK_AXIS = "blk"    # z blocks
Y_AXIS = "blky"       # y blocks (2-D partitioning; SURVEY §7 "3D blocks")


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (BLOCK_AXIS,))


def make_mesh2d(nz_shards: int, ny_shards: int, devices=None) -> Mesh:
    """2-D (z x y) block mesh. x stays unsharded by design: it is the TPU
    lane dimension — splitting it would fracture the (8, 128) tiles every
    kernel is built on, while z x y already bounds per-chip slab sizes (a
    32-chip (8, 4) mesh keeps 64^3 octaves shardable where a 1-D 32-way
    split replicates them — the round-3 efficiency collapse)."""
    if devices is None:
        devices = jax.devices()[: nz_shards * ny_shards]
    return Mesh(
        np.asarray(devices).reshape(nz_shards, ny_shards),
        (BLOCK_AXIS, Y_AXIS),
    )


def mesh_zy(mesh: Mesh) -> tuple[int, int]:
    """(nz_shards, ny_shards) of a 1-D or 2-D block mesh."""
    return mesh.shape[BLOCK_AXIS], mesh.shape.get(Y_AXIS, 1)


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Volume block-sharded: z blocks, plus y blocks on a 2-D mesh."""
    if Y_AXIS in mesh.shape:
        return NamedSharding(mesh, P(BLOCK_AXIS, Y_AXIS, None))
    return NamedSharding(mesh, P(BLOCK_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Keypoint-major arrays split along axis 0 (data-parallel matching)."""
    if Y_AXIS in mesh.shape:
        return NamedSharding(mesh, P((BLOCK_AXIS, Y_AXIS)))
    return NamedSharding(mesh, P(BLOCK_AXIS))
