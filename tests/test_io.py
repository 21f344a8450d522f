"""NIfTI and matrixIO3D round-trip tests."""

import gzip

import numpy as np
import pytest

from sift3d_tpu.io import matrixio, nifti


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((5, 7, 9)).astype(np.float32)
    p = tmp_path / "vol.nii"
    nifti.write_nii(p, vol)
    back = nifti.read_nii(p)
    np.testing.assert_array_equal(back, vol)


def test_nifti_gz_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    vol = rng.standard_normal((4, 6, 8)).astype(np.float32)
    p = tmp_path / "vol.nii.gz"
    nifti.write_nii(p, vol)
    back = nifti.read_nii(p)
    np.testing.assert_array_equal(back, vol)


def test_nifti_int16_converts_to_float32(tmp_path):
    rng = np.random.default_rng(2)
    vol = rng.integers(-1000, 1000, size=(3, 4, 5)).astype(np.int16)
    p = tmp_path / "vol.nii"
    nifti.write_nii(p, vol)
    back = nifti.read_nii(p)
    assert back.dtype == np.float32
    np.testing.assert_array_equal(back, vol.astype(np.float32))


def test_nifti_rejects_garbage(tmp_path):
    p = tmp_path / "junk.nii"
    p.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError):
        nifti.read_nii(p)


def test_matrixio_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    vol = rng.standard_normal((3, 5, 7)).astype(np.float32)
    p = tmp_path / "vol.dat"
    matrixio.write_matrix(p, vol)
    back = matrixio.read_matrix(p)
    np.testing.assert_array_equal(back, vol)
    # header is (m=nx, n=ny, p=nz)
    import struct

    m, n, pp = struct.unpack("<3i", p.read_bytes()[:12])
    assert (m, n, pp) == (7, 5, 3)


def test_native_reader_parity(tmp_path):
    from sift3d_tpu.io import native

    rng = np.random.default_rng(9)
    for suffix, dt in [(".nii", np.float32), (".nii.gz", np.int16)]:
        vol = (rng.standard_normal((6, 7, 8)) * 50).astype(dt)
        p = tmp_path / f"v{suffix}"
        nifti.write_nii(p, vol)
        np.testing.assert_array_equal(native.read_nii(p), nifti.read_nii(p))
