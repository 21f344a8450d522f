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

BLOCK_AXIS = "blk"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (BLOCK_AXIS,))


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Volume sharded in z-blocks: (nz, ny, nx) split along axis 0."""
    return NamedSharding(mesh, P(BLOCK_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Keypoint-major arrays split along axis 0 (data-parallel matching)."""
    return NamedSharding(mesh, P(BLOCK_AXIS))
