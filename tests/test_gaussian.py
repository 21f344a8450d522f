"""Parity of the MXU smoothing-matrix blur vs the oracle's loop-faithful
convolution (both replicate GaussianSmooth_3D, Src/cSIFT3D.cc:535-790)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sift3d_tpu.ops import gaussian as G
from sift3d_tpu.oracle import cpu_sift
from sift3d_tpu.pyramid import gaussian_kernel, smoothing_matrix


def test_kernel_matches_oracle():
    for sigma in [0.5387, 1.2699, 1.6, 2.4551, 0.2]:
        k_jax = gaussian_kernel(sigma)
        k_orc = cpu_sift.gaussian_kernel_ref(sigma)
        np.testing.assert_array_equal(k_jax, k_orc)


def test_kernel_normalised():
    for sigma in [0.3, 0.9, 1.7, 2.455]:
        k = gaussian_kernel(sigma)
        assert abs(float(k.sum()) - 1.0) < 1e-6


def test_smoothing_matrix_rows_sum_to_one():
    # Interior rows sum to exactly the kernel sum; boundary rows are convex
    # combinations of taps, so they also sum to ~1.
    for n, sigma in [(16, 1.27), (32, 2.455), (9, 2.455)]:
        W = smoothing_matrix(n, gaussian_kernel(sigma))
        np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=2e-6)


@pytest.mark.parametrize("shape", [(16, 16, 16), (12, 18, 24), (9, 11, 13)])
@pytest.mark.parametrize("sigma", [0.5387, 1.2699, 2.4551])
def test_blur_matches_oracle(shape, sigma):
    rng = np.random.default_rng(0)
    vol = rng.standard_normal(shape).astype(np.float32)
    want = cpu_sift.gaussian_smooth_3d(vol, sigma)
    got = np.asarray(G.gaussian_blur(jnp.asarray(vol), sigma))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


def test_downsample_matches_oracle():
    rng = np.random.default_rng(1)
    vol = rng.standard_normal((13, 17, 9)).astype(np.float32)
    want = cpu_sift.downsample(vol)
    got = np.asarray(G.downsample(jnp.asarray(vol)))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (6, 8, 4)


def test_data_scale():
    vol = np.array([[[2.0, -4.0], [1.0, 0.5]]], dtype=np.float32)
    got = np.asarray(G.data_scale(jnp.asarray(vol)))
    np.testing.assert_allclose(got, vol / 4.0)
