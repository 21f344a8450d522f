"""Native (C++) NIfTI reader with pure-Python fallback.

The C extension (native/nifti_reader.cc, built by native/build.sh) decodes
gzip + converts dtypes off the GIL; `read_nii` falls back to the pure-Python
reader (sift3d_tpu.io.nifti) when the extension is not built.
"""

from __future__ import annotations

import numpy as np

from . import nifti as _py

try:
    from . import _nifti_native  # type: ignore

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - build-environment dependent
    _nifti_native = None
    HAVE_NATIVE = False


def read_nii(path) -> np.ndarray:
    """Read .nii/.nii.gz as (nz, ny, nx) float32, native-accelerated."""
    if _nifti_native is not None:
        buf, nx, ny, nz = _nifti_native.read_nii(str(path))
        return np.frombuffer(buf, dtype=np.float32).reshape(nz, ny, nx).copy()
    return _py.read_nii(path)


def read_nii_batch(paths, nthreads: int = 4) -> list[np.ndarray]:
    """Read many volumes with a native thread pool (parallel gz inflate +
    dtype conversion, GIL released); falls back to sequential reads."""
    if _nifti_native is not None:
        out = _nifti_native.read_nii_batch([str(p) for p in paths], nthreads)
        return [
            np.frombuffer(buf, dtype=np.float32).reshape(nz, ny, nx).copy()
            for buf, nx, ny, nz in out
        ]
    return [read_nii(p) for p in paths]
