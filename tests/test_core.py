"""Fast unit tests: config constants, geometry, sigma schedule, pyramid plan."""

import math

import numpy as np
import pytest

from sift3d_tpu import config as C
from sift3d_tpu.geometry import MESH_CONST, TRI_IDX, TRI_VERTS, build_mesh
from sift3d_tpu.pyramid import (
    base_sigma,
    gaussian_kernel,
    make_plan,
    sigma_schedule,
    smoothing_matrix,
)


def test_constants_match_reference():
    assert C.DESC_NUMEL == 768
    assert abs(C.TRUNC_THRESH - 0.2 * 128 / 768) < 1e-12
    assert C.ICOS_NFACES == 20 and C.ICOS_NVERT == 12
    cfg = C.SiftConfig()
    assert cfg.gss_levels == 6 and cfg.dog_levels == 5
    assert abs(cfg.sigma0() - 1.6 * 2 ** (-1 / 3)) < 1e-12


def test_octave_count():
    cfg = C.SiftConfig()
    assert cfg.num_octaves((256, 256, 256)) == 6
    assert cfg.num_octaves((128, 256, 256)) == 5
    assert cfg.num_octaves((32, 32, 32)) == 3   # 32 -> 16 -> 8
    assert cfg.num_octaves((16, 16, 16)) == 2


def test_icosahedron_geometry():
    verts, idx = build_mesh()
    assert verts.shape == (20, 3, 3) and idx.shape == (20, 3)
    # all vertices unit length
    np.testing.assert_allclose(np.linalg.norm(verts, axis=-1), 1.0, atol=1e-6)
    # outward winding: dot(cross(v2-v1, v1-v0), v0) >= 0 after the fix
    t1 = verts[:, 2] - verts[:, 1]
    t2 = verts[:, 1] - verts[:, 0]
    n = np.cross(t1, t2)
    assert (np.sum(n * verts[:, 0], axis=-1) >= 0).all()
    # faces tile the sphere: every direction hits exactly one face interior
    rng = np.random.default_rng(0)
    dirs = rng.standard_normal((500, 3)).astype(np.float32)
    from sift3d_tpu.oracle.cpu_sift import _cart2bary_first_face

    face, bary = _cart2bary_first_face(dirs)
    assert (face >= 0).all()
    # barycentric coordinates approximately sum to 1 and are >= -eps
    np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-4)
    assert (bary >= -C.BARY_EPS).all()


def test_mesh_constants_consistent():
    v0 = TRI_VERTS[:, 0]
    np.testing.assert_allclose(MESH_CONST["t"], -v0, atol=0)
    np.testing.assert_allclose(
        MESH_CONST["e1"], TRI_VERTS[:, 1] - v0, atol=0
    )


def test_sigma_schedule_values():
    cfg = C.SiftConfig()
    s = sigma_schedule(cfg)
    sigma0 = 1.6 * 2 ** (-1 / 3)
    k = 2 ** (1 / 3)
    assert abs(s[0] - sigma0) < 1e-6
    for i in range(1, 6):
        want = math.sqrt((k ** i * sigma0) ** 2 - (k ** (i - 1) * sigma0) ** 2)
        assert abs(float(s[i]) - want) < 1e-5, i
    # base blur removes the nominal scale
    assert abs(base_sigma(cfg) - math.sqrt(sigma0 ** 2 - 1.15 ** 2)) < 1e-6


def test_kernel_width_rule():
    # half_width = max(ceil(3 sigma), 1)
    assert len(gaussian_kernel(0.1)) == 2 * 1 + 1
    assert len(gaussian_kernel(1.0)) == 2 * 3 + 1
    assert len(gaussian_kernel(2.4551)) == 2 * 8 + 1


def test_plan_metadata():
    cfg = C.SiftConfig()
    plan = make_plan(cfg, (64, 64, 64))
    assert plan.num_octaves == 4  # 64 -> 32 -> 16 -> 8
    m00 = plan.gss_meta(0, 0)
    assert m00.shape == (64, 64, 64) and m00.unit == 1.0
    m21 = plan.gss_meta(2, 1)
    assert m21.shape == (16, 16, 16) and m21.unit == 4.0
    sigma0 = cfg.sigma0()
    assert abs(m21.scale - sigma0 * 2 ** (2 + 1 / 3)) < 1e-4
    # DoG level scale mirrors GSS
    assert plan.dog_meta(1, 2).scale == plan.gss_meta(1, 2).scale


def test_smoothing_matrix_interior_is_plain_band():
    k = gaussian_kernel(1.0)
    W = smoothing_matrix(32, k)
    # interior row 10: taps at [7..13]
    np.testing.assert_array_equal(W[10, 7:14], k[::-1])
    assert W[10, :7].sum() == 0 and W[10, 14:].sum() == 0


def test_smoothing_matrix_right_edge_blend():
    # tap hitting exactly n-1 becomes a 0.1/0.9 blend of n-2, n-1
    k = gaussian_kernel(1.0)
    n = 32
    W = smoothing_matrix(n, k)
    # row n-hw-1 ... all boundary rows; check row n-1 center tap:
    # c = n-1 -> mirrored to n-1-0.1 -> 0.1*src[n-2] + 0.9*src[n-1]
    hw = len(k) // 2
    row = np.zeros(n, np.float32)
    for d in range(-hw, hw + 1):
        tap = k[d + hw]
        c = np.float32(n - 1 - d)
        if c >= n - 1:
            c = np.float32(2 * (n - 1) - c - np.float32(0.1))
        lo = int(c)
        frac = np.float32(c - lo)
        row[lo] += tap * (1 - frac)
        row[min(lo + 1, n - 1)] += tap * frac
    np.testing.assert_allclose(W[n - 1], row, atol=1e-7)


def test_detection_cap_truncates_in_scan_order():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sift3d_tpu.ops import detect as D

    rng = np.random.default_rng(5)
    vol = rng.standard_normal((16, 16, 16)).astype(np.float32)
    # prev/next at half amplitude: in-level local extrema survive the
    # cross-level comparison
    full = D.detect_level(jnp.asarray(vol * 0.5), jnp.asarray(vol),
                          jnp.asarray(vol * 0.5), 0.01, 4096)
    count = int(full.count)
    assert count > 16
    capped = D.detect_level(jnp.asarray(vol * 0.5), jnp.asarray(vol),
                            jnp.asarray(vol * 0.5), 0.01, 16)
    assert int(capped.count) == count  # true count still reported
    # the 16 kept are exactly the first 16 in z,y,x scan order
    np.testing.assert_array_equal(
        np.asarray(capped.x), np.asarray(full.x)[:16])
    np.testing.assert_array_equal(
        np.asarray(capped.z), np.asarray(full.z)[:16])


def test_cap_for_octave_decay():
    cfg = C.SiftConfig(max_kp_per_level=16384, cap_octave_decay=3, cap_floor=512)
    assert cfg.cap_for_octave(0) == 16384
    assert cfg.cap_for_octave(1) == 2048
    assert cfg.cap_for_octave(2) == 512
    assert cfg.cap_for_octave(5) == 512
    small = C.SiftConfig(max_kp_per_level=256)
    assert small.cap_for_octave(3) == 256


def test_extract_timed_reports_stages():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from sift3d_tpu import SIFT3D, SiftConfig
    from sift3d_tpu.oracle import fixtures
    from sift3d_tpu.utils.timing import rejection_histogram

    vol = fixtures.smooth_random_volume((32, 32, 32), seed=7, smooth=2)
    sift = SIFT3D(SiftConfig(max_kp_per_level=256))
    kps, timer = sift.extract_timed(vol)
    assert "BuildGSS+DoG" in timer.stages
    assert timer.total > 0
    hist = rejection_histogram(kps)
    assert hist["accepted"] == int(kps.num_valid)
    assert hist["detected"] >= hist["accepted"]


def test_capacity_overflow_flag_and_warning():
    """VERDICT r1 item 8: library users must see capacity truncation.

    dropped_by_cap counts extrema beyond per-level caps, and compact_valid
    emits a RuntimeWarning when any were dropped (ops/detect.py keeps the
    first `cap` in scan order; the reference grows unboundedly)."""
    import warnings

    import jax

    jax.config.update("jax_platforms", "cpu")
    from sift3d_tpu import SIFT3D, SiftConfig
    from sift3d_tpu.pipeline import compact_valid
    from sift3d_tpu.oracle import fixtures

    vol = fixtures.smooth_random_volume((32, 32, 32), seed=7, smooth=2)
    tiny = SIFT3D(SiftConfig(max_kp_per_level=8, cap_floor=8))
    kps = tiny.extract(vol)
    assert int(kps.dropped_by_cap) > 0
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        compact_valid(kps)
    assert any("overflow" in str(x.message) for x in w)

    roomy = SIFT3D(SiftConfig(max_kp_per_level=512))
    kps2 = roomy.extract(vol)
    assert int(kps2.dropped_by_cap) == 0
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        compact_valid(kps2)
    assert not any("overflow" in str(x.message) for x in w)


def test_match_timed_matches_untimed():
    """match_timed must produce identical pairs to enhanced_match and fill
    the reference's matcher phase counters (cMatcher.h:60-67 parity)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from sift3d_tpu import SIFT3D, SiftConfig, enhanced_match
    from sift3d_tpu.pipeline import match_timed
    from sift3d_tpu.oracle import fixtures

    ref_v = fixtures.smooth_random_volume((32, 32, 32), seed=7, smooth=2)
    tar_v = fixtures.smooth_random_volume((32, 32, 32), seed=8, smooth=2)
    sift = SIFT3D(SiftConfig(max_kp_per_level=256))
    kr, kt = sift.extract(ref_v), sift.extract(tar_v)

    rc0, tc0, v0 = enhanced_match(kr, kt, 0.85)
    (rc1, tc1, v1), timer = match_timed(kr, kt, 0.85)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(rc0), np.asarray(rc1))
    np.testing.assert_array_equal(np.asarray(tc0), np.asarray(tc1))
    for phase in ("match", "filter", "countMatched", "revMatch",
                  "revFilter", "bijectFilter", "converse"):
        assert phase in timer.stages, phase


def test_extract_pair_equals_sequential():
    """extract_pair (both volumes fused into each stage module, half the
    dispatches) returns bit-identical KeypointSets to two extract() calls."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from sift3d_tpu import SIFT3D, SiftConfig
    from sift3d_tpu.oracle import fixtures

    a = fixtures.smooth_random_volume((32, 32, 32), seed=11, smooth=2)
    b = fixtures.smooth_random_volume((32, 32, 32), seed=12, smooth=2)
    sift = SIFT3D(SiftConfig(max_kp_per_level=256))
    ka_p, kb_p = sift.extract_pair(a, b)
    ka, kb = sift.extract(a), sift.extract(b)
    for f in ka._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ka, f)), np.asarray(getattr(ka_p, f)), err_msg=f
        )
        np.testing.assert_array_equal(
            np.asarray(getattr(kb, f)), np.asarray(getattr(kb_p, f)), err_msg=f
        )
    # different shapes fall back to sequential extraction
    c = fixtures.smooth_random_volume((32, 32, 40), seed=13, smooth=2)
    kc1, kc2 = sift.extract_pair(a, c)
    assert kc2.valid.shape == sift.extract(c).valid.shape


@pytest.mark.parametrize("shape", [(8, 8, 8), (8, 64, 8), (12, 40, 20),
                                   (9, 9, 9), (128, 16, 16)])
def test_edge_shapes_match_oracle(shape):
    """Minimum-size, odd and extreme-anisotropic volumes: keypoint sets
    equal the oracle (octave planning, window clamps and the exact-span
    window_size all stress-tested at the smallest dims)."""
    import numpy as np

    from sift3d_tpu import SIFT3D, SiftConfig
    from sift3d_tpu.oracle import cpu_sift, fixtures

    vol = fixtures.smooth_random_volume(shape, seed=5, smooth=1)
    kps = SIFT3D(SiftConfig(max_kp_per_level=256)).extract(vol)
    xyz = np.asarray(kps.xyz)
    v = np.asarray(kps.valid)
    o = np.asarray(kps.octave)
    l = np.asarray(kps.level)
    got = {(int(o[i]), int(l[i]), int(xyz[i, 2]), int(xyz[i, 1]),
            int(xyz[i, 0])) for i in range(len(v)) if v[i]}
    orc = cpu_sift.run_sift(np.asarray(vol), SiftConfig(max_kp_per_level=256))
    want = {(k.octave, k.level, k.z, k.y, k.x) for k in orc.keypoints}
    assert got == want
