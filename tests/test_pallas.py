"""Pallas kernel unit tests (interpret mode on CPU)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sift3d_tpu.config import DESC_RAD_FCTR, DESC_SIG_FCTR, SiftConfig
from sift3d_tpu.ops import descriptor as DE
from sift3d_tpu.ops import windows as W
from sift3d_tpu.ops.pallas.compact_kernel import CTILE, compact_mask_pallas
from sift3d_tpu.pyramid import make_plan


@pytest.mark.parametrize("density,hits_cap", [(0.0005, 256), (0.0, 64), (0.2, 128)])
def test_compact_kernel_matches_nonzero(density, hits_cap):
    rng = np.random.default_rng(1)
    n = CTILE * 3
    m = rng.random(n) < density
    got = np.asarray(compact_mask_pallas(jnp.asarray(m), hits_cap, interpret=True))
    count = int(m.sum())
    want = np.nonzero(m)[0][:hits_cap]
    k = min(count, hits_cap)
    np.testing.assert_array_equal(got[:k], want[:k])


def test_descriptor_kernel_matches_xla_path():
    cfg = SiftConfig()
    plan = make_plan(cfg, (32, 32, 32))
    meta = plan.gss_meta(0, 1)
    scale32 = np.float32(meta.scale)
    sigma = float(np.float32(scale32 * np.float32(DESC_SIG_FCTR)))
    win_radius = float(np.float32(np.float32(DESC_RAD_FCTR) * np.float32(sigma)))
    desc_hw = float(np.float32(win_radius / math.sqrt(2.0)))
    desc_bin_fctr = float(np.float32(np.float32(4.0) / np.float32(2.0 * desc_hw)))
    r_vox = W.radius_voxels(win_radius, meta.unit)
    wshape = tuple(W.window_size(r_vox, n + 2) for n in meta.shape)
    consts = (r_vox, win_radius, sigma, desc_hw, desc_bin_fctr, wshape)

    rng = np.random.default_rng(0)
    B = 4
    gss_pad = jnp.asarray(rng.standard_normal((34, 34, 34)).astype(np.float32))
    bx = jnp.asarray(rng.integers(5, 27, B).astype(np.int32))
    by = jnp.asarray(rng.integers(5, 27, B).astype(np.int32))
    bz = jnp.asarray(rng.integers(5, 27, B).astype(np.int32))
    rots = []
    for _ in range(B):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        rots.append(q.astype(np.float32))
    rot = jnp.asarray(np.stack(rots))
    ok = jnp.asarray(np.array([True, True, True, False]))

    a = np.asarray(DE._desc_one_block(gss_pad, bx, by, bz, rot, ok, meta, consts))
    b = np.asarray(
        DE._desc_one_block_pallas(gss_pad, bx, by, bz, rot, ok, meta, consts)
    )
    assert np.abs(a - b).max() < 1e-4
    assert np.abs(b[3]).max() == 0.0  # masked keypoint stays zero


def test_orientation_kernel_matches_xla_path():
    from sift3d_tpu.ops import detect as D
    from sift3d_tpu.ops import orientation as O

    cfg_x = SiftConfig(max_kp_per_level=64, kp_block=8, use_pallas=False)
    cfg_p = SiftConfig(max_kp_per_level=64, kp_block=8, use_pallas=True)
    plan = make_plan(cfg_x, (32, 32, 32))
    meta = plan.gss_meta(0, 1)

    rng = np.random.default_rng(2)
    gss_pad = jnp.asarray(rng.standard_normal((34, 34, 34)).astype(np.float32))
    n = 20
    det = D.LevelDetections(
        x=jnp.asarray(np.pad(rng.integers(2, 30, n), (0, 44)).astype(np.int32)),
        y=jnp.asarray(np.pad(rng.integers(2, 30, n), (0, 44)).astype(np.int32)),
        z=jnp.asarray(np.pad(rng.integers(2, 30, n), (0, 44)).astype(np.int32)),
        valid=jnp.asarray(np.arange(64) < n),
        count=jnp.int32(n),
        threshold=jnp.float32(0.1),
    )
    a = O.assign_orientation(gss_pad, det, meta, cfg_x)
    b = O.assign_orientation(gss_pad, det, meta, cfg_p)
    np.testing.assert_allclose(
        np.asarray(a.str_tensor), np.asarray(b.str_tensor), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(a.mean_grad), np.asarray(b.mean_grad), atol=1e-6, rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(a.status), np.asarray(b.status))


@pytest.mark.parametrize(
    "shape,sigma",
    [((32, 32, 32), 1.2699), ((16, 24, 32), 2.4551), ((48, 40, 56), 0.5387)],
)
def test_blur_kernel_matches_xla(shape, sigma):
    from sift3d_tpu.ops.gaussian import gaussian_blur
    from sift3d_tpu.ops.pallas.blur_kernel import gaussian_blur_pallas

    rng = np.random.default_rng(4)
    v = rng.standard_normal(shape).astype(np.float32)
    a = np.asarray(gaussian_blur(jnp.asarray(v), sigma))
    b = np.asarray(gaussian_blur_pallas(jnp.asarray(v), sigma, interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-6)


@pytest.mark.parametrize(
    "shape,sigma",
    [((32, 32, 32), 1.2699), ((32, 24, 64), 2.4551), ((64, 32, 128), 2.8)],
)
def test_blur_kernel2_matches_xla(shape, sigma):
    """v2 streaming blur (shift-FMA interior + exact boundary-band einsums,
    ops/pallas/blur_kernel2.py) matches the einsum path to reduction-order
    ulps on every axis, including the conv_eps boundary rows."""
    from sift3d_tpu.ops.gaussian import gaussian_blur
    from sift3d_tpu.ops.pallas.blur_kernel2 import gaussian_blur_pallas2

    rng = np.random.default_rng(4)
    v = rng.standard_normal(shape).astype(np.float32)
    a = np.asarray(gaussian_blur(jnp.asarray(v), sigma))
    b = np.asarray(gaussian_blur_pallas2(jnp.asarray(v), sigma, interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-6)


@pytest.mark.parametrize("shape", [(32, 32, 32), (16, 24, 40), (8, 8, 8)])
def test_fused_detect_kernel_matches_xla_path(shape):
    from sift3d_tpu.ops import detect as D
    from sift3d_tpu.ops.pallas.detect_kernel import detect_level_pallas

    rng = np.random.default_rng(0)
    prev, cur, nxt = (
        jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3)
    )
    cap = 512
    mask, thres = D.extrema_mask(prev, cur, nxt, 0.1)
    ref = D.compact(mask, cap, thres, use_pallas=False)
    idx, count, thr = detect_level_pallas(
        prev, cur, nxt, 0.1, cap, interpret=True
    )
    got = D.decode_indices(idx, count, thr, shape)
    assert float(thr) == float(thres)  # threshold bit-identical (exact max)
    assert int(got.count) == int(ref.count)  # counts ALL extrema, beyond cap
    for f in ("x", "y", "z"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f)[ref.valid]),
            np.asarray(getattr(got, f)[got.valid]),
        )
