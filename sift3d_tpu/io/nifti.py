"""NIfTI-1/NIfTI-2 volume I/O (readNiiFile parity, Src/Util/readNii.cpp).

The reference vendors layNii (nifti2_io + znzlib + zlib, ~11k LoC,
SURVEY.md §2.18-2.20) solely to read a .nii/.nii.gz file into a float32
array. This module is a from-scratch reader/writer for the same formats:

- NIfTI-1 (348-byte header, magic "n+1"/"ni1") and NIfTI-2 (540-byte
  header, magic "n+2"), little or big endian, optionally gzipped;
- dtype conversion to float32 with scl_slope/scl_inter applied when set
  (matching copy_nifti_as_float32, 3party/layNii/dep/laynii_lib.cpp:226);
- returns the volume as a (nz, ny, nx) C-order array whose fastest axis is
  x, matching the reference's flat indexing (voxel_idx = nx*ny*z + nx*y + x,
  Src/Util/readNii.cpp:28-35).

A companion C++ implementation lives in native/nifti_reader.cc for the
high-throughput data-loading path; this Python reader is the portable
fallback and the correctness reference for it.
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path

import numpy as np

# NIfTI datatype codes -> numpy dtypes
_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
    1024: np.int64,
    1280: np.uint64,
}
_CODE_FOR = {np.dtype(v): k for k, v in _DTYPES.items()}


def _open_maybe_gz(path: str | Path):
    path = Path(path)
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(f)
    return f


def _read_header(data: bytes):
    """Parse a NIfTI-1 or NIfTI-2 header from the first bytes of the file.

    Returns dict(dims, dtype, vox_offset, scl_slope, scl_inter, endian).
    """
    if len(data) < 348:
        raise ValueError("file too short for a NIfTI header")

    sizeof_hdr_le = struct.unpack("<i", data[:4])[0]
    sizeof_hdr_be = struct.unpack(">i", data[:4])[0]
    if sizeof_hdr_le in (348, 540):
        endian, sizeof_hdr = "<", sizeof_hdr_le
    elif sizeof_hdr_be in (348, 540):
        endian, sizeof_hdr = ">", sizeof_hdr_be
    else:
        raise ValueError(f"not a NIfTI file (sizeof_hdr={sizeof_hdr_le})")

    if sizeof_hdr == 348:  # NIfTI-1
        magic = data[344:348]
        if magic[:3] not in (b"n+1", b"ni1"):
            raise ValueError(f"bad NIfTI-1 magic {magic!r}")
        dim = struct.unpack(endian + "8h", data[40:56])
        datatype = struct.unpack(endian + "h", data[70:72])[0]
        # bitpix at 72
        vox_offset = struct.unpack(endian + "f", data[108:112])[0]
        scl_slope = struct.unpack(endian + "f", data[112:116])[0]
        scl_inter = struct.unpack(endian + "f", data[116:120])[0]
        pixdim = struct.unpack(endian + "8f", data[76:108])
    else:  # NIfTI-2
        magic = data[4:8]
        if magic[:3] not in (b"n+2", b"ni2"):
            raise ValueError(f"bad NIfTI-2 magic {magic!r}")
        datatype = struct.unpack(endian + "h", data[12:14])[0]
        dim = struct.unpack(endian + "8q", data[16:80])
        pixdim = struct.unpack(endian + "8d", data[104:168])
        vox_offset = struct.unpack(endian + "q", data[168:176])[0]
        scl_slope = struct.unpack(endian + "d", data[176:184])[0]
        scl_inter = struct.unpack(endian + "d", data[184:192])[0]

    ndim = int(dim[0])
    if not 1 <= ndim <= 7:
        raise ValueError(f"bad dim[0]={ndim}")
    shape = tuple(int(d) for d in dim[1 : 1 + ndim])
    if datatype not in _DTYPES:
        raise ValueError(f"unsupported NIfTI datatype {datatype}")
    return {
        "shape": shape,
        "dtype": np.dtype(_DTYPES[datatype]).newbyteorder(endian),
        "vox_offset": int(vox_offset),
        "scl_slope": float(scl_slope),
        "scl_inter": float(scl_inter),
        "pixdim": tuple(float(p) for p in pixdim[1 : 1 + ndim]),
    }


def read_nii(path: str | Path) -> np.ndarray:
    """Read a .nii / .nii.gz volume as (nz, ny, nx) float32.

    Matches readNiiFile (Src/Util/readNii.cpp:5-39): the first three dims
    are (nx, ny, nz) with x fastest on disk; data is converted to float32
    (with scl scaling when slope is set and not the identity, like
    copy_nifti_as_float32); trailing dims (time/channels) must be 1.
    """
    with _open_maybe_gz(path) as f:
        raw = f.read()
    hdr = _read_header(raw)
    shape = hdr["shape"]
    if any(s != 1 for s in shape[3:]):
        raise ValueError(f"only 3-D volumes supported, got {shape}")
    nx, ny, nz = (shape + (1, 1, 1))[:3]

    count = nx * ny * nz
    data = np.frombuffer(
        raw, dtype=hdr["dtype"], count=count, offset=hdr["vox_offset"]
    )
    vol = data.reshape((nz, ny, nx))  # x fastest on disk -> C-order (z, y, x)
    out = vol.astype(np.float32)
    slope, inter = hdr["scl_slope"], hdr["scl_inter"]
    # Apply scl scaling unless (slope, inter) is a no-op (0/ignored or
    # identity). The asymmetry is deliberate: slope=1/inter!=0 IS applied
    # while slope=0/inter!=0 is ignored — the NIfTI spec says slope=0
    # means "no scaling stored", and laynii's copy_nifti_as_float32
    # (3party/layNii/dep/laynii_lib.cpp:226) ignores that combination the
    # same way. Do not "fix" this to test inter alone.
    if slope not in (0.0, 1.0) or (slope != 0.0 and inter != 0.0):
        out = out * np.float32(slope) + np.float32(inter)
    return out


def write_nii(path: str | Path, vol: np.ndarray, pixdim=(1.0, 1.0, 1.0)) -> None:
    """Write a (nz, ny, nx) volume as NIfTI-1 (.nii, or .nii.gz by suffix)."""
    path = Path(path)
    vol = np.ascontiguousarray(vol)
    if vol.dtype not in _CODE_FOR:
        vol = vol.astype(np.float32)
    code = _CODE_FOR[np.dtype(vol.dtype.newbyteorder("="))]
    nz, ny, nx = vol.shape

    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, nx, ny, nz, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, code)
    struct.pack_into("<h", hdr, 72, vol.dtype.itemsize * 8)  # bitpix
    struct.pack_into("<8f", hdr, 76, 1.0, *pixdim, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)    # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)    # scl_inter
    hdr[344:348] = b"n+1\x00"

    payload = bytes(hdr) + b"\x00" * 4 + vol.astype(vol.dtype.newbyteorder("<")).tobytes()
    if path.suffix == ".gz" or str(path).endswith(".nii.gz"):
        with gzip.open(path, "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)
