"""Raw binary volume I/O in the reference's matrixIO3D format.

Format (Include/Util/matrixIO3D.h): three int32 header words m, n, p
followed by m*n*p values, row-major. The reference's path-based factory
(CSIFT3DFactory::CreateCSIFT3D(std::string), Src/cSIFT3D.cc:112-125) reads
these as (x_dim, y_dim, z_dim) with x fastest in memory, i.e. the payload in
file order maps to a (nz=p, ny=n, nx=m) C-order array.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def read_matrix(path: str | Path, dtype=np.float32) -> np.ndarray:
    """Read a matrixIO3D volume as a (nz, ny, nx) array."""
    raw = Path(path).read_bytes()
    m, n, p = struct.unpack("<3i", raw[:12])
    count = m * n * p
    data = np.frombuffer(raw, dtype=np.dtype(dtype).newbyteorder("<"),
                         count=count, offset=12)
    return data.reshape((p, n, m)).astype(dtype)


def write_matrix(path: str | Path, vol: np.ndarray) -> None:
    """Write a (nz, ny, nx) array in matrixIO3D layout (header m=nx,n=ny,p=nz)."""
    vol = np.ascontiguousarray(vol)
    nz, ny, nx = vol.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<3i", nx, ny, nz))
        f.write(vol.astype(vol.dtype.newbyteorder("<")).tobytes())
