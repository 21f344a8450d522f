"""End-to-end parity: TPU pipeline vs CPU oracle on small volumes.

This is the framework's version of the reference's dump-and-diff protocol
(SURVEY.md §4): every intermediate — GSS/DoG levels, detection sets,
orientation decisions, rotations, descriptors, matches — is compared against
the loop-faithful oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sift3d_tpu import SIFT3D, SiftConfig, enhanced_match
from sift3d_tpu.pipeline import build_pyramids
from sift3d_tpu.pyramid import make_plan
from sift3d_tpu.ops import gaussian as G
from sift3d_tpu.oracle import cpu_sift, cpu_match, fixtures


def _key(kp):
    return (kp.octave, kp.level, kp.z, kp.y, kp.x)


@pytest.fixture(scope="module")
def pair32(rand32, oracle32):
    sift = SIFT3D(SiftConfig(max_kp_per_level=512))
    kps = sift.extract(rand32)
    return kps, oracle32


def test_pyramids_match_oracle(rand32, oracle32):
    cfg = SiftConfig()
    plan = make_plan(cfg, rand32.shape)
    vol = G.data_scale(jnp.asarray(rand32))
    gss, dog = build_pyramids(vol, plan)
    assert len(gss) == len(oracle32.gss)
    for i, (a, b) in enumerate(zip(gss, oracle32.gss)):
        np.testing.assert_allclose(
            np.asarray(a), b.data, atol=5e-6, rtol=1e-4,
            err_msg=f"GSS level {i}",
        )
    for i, (a, b) in enumerate(zip(dog, oracle32.dog)):
        np.testing.assert_allclose(
            np.asarray(a), b.data, atol=5e-6, rtol=1e-3,
            err_msg=f"DoG level {i}",
        )


def test_detection_matches_oracle(pair32):
    kps, oracle = pair32
    got = set()
    xyz = np.asarray(kps.xyz)
    status = np.asarray(kps.status)
    oct_ = np.asarray(kps.octave)
    lev = np.asarray(kps.level)
    for i in range(xyz.shape[0]):
        if status[i] != 0:  # detected lane (any orientation outcome)
            got.add((int(oct_[i]), int(lev[i]), int(xyz[i, 2]), int(xyz[i, 1]), int(xyz[i, 0])))
    want = {_key(kp) for kp in oracle.all_extrema}
    assert got == want


def test_orientation_status_matches_oracle(pair32):
    kps, oracle = pair32
    got = {}
    xyz = np.asarray(kps.xyz)
    status = np.asarray(kps.status)
    oct_ = np.asarray(kps.octave)
    lev = np.asarray(kps.level)
    for i in range(xyz.shape[0]):
        if status[i] != 0:
            got[(int(oct_[i]), int(lev[i]), int(xyz[i, 2]), int(xyz[i, 1]), int(xyz[i, 0]))] = int(status[i])
    mismatches = []
    for kp in oracle.all_extrema:
        k = _key(kp)
        if got.get(k) != kp.status:
            mismatches.append((k, kp.status, got.get(k)))
    # allow a tiny fraction of borderline decision flips from fp differences
    assert len(mismatches) <= max(1, len(oracle.all_extrema) // 100), mismatches[:10]


def test_rotations_match_oracle(pair32):
    kps, oracle = pair32
    got = {}
    xyz = np.asarray(kps.xyz)
    rot = np.asarray(kps.rotation)
    valid = np.asarray(kps.valid)
    oct_ = np.asarray(kps.octave)
    lev = np.asarray(kps.level)
    for i in range(xyz.shape[0]):
        if valid[i]:
            got[(int(oct_[i]), int(lev[i]), int(xyz[i, 2]), int(xyz[i, 1]), int(xyz[i, 0]))] = rot[i]
    checked = 0
    for kp in oracle.keypoints:
        k = _key(kp)
        if k in got:
            np.testing.assert_allclose(got[k], kp.rotation, atol=2e-3, err_msg=str(k))
            checked += 1
    assert checked >= 0.99 * len(oracle.keypoints)


def test_descriptors_match_oracle(pair32):
    kps, oracle = pair32
    got = {}
    xyz = np.asarray(kps.xyz)
    desc = np.asarray(kps.desc)
    rxyz = np.asarray(kps.rxyz)
    valid = np.asarray(kps.valid)
    oct_ = np.asarray(kps.octave)
    lev = np.asarray(kps.level)
    for i in range(xyz.shape[0]):
        if valid[i]:
            got[(int(oct_[i]), int(lev[i]), int(xyz[i, 2]), int(xyz[i, 1]), int(xyz[i, 0]))] = (
                desc[i], rxyz[i],
            )
    checked = 0
    for kp in oracle.keypoints:
        k = _key(kp)
        if k in got:
            d, r = got[k]
            l2 = float(np.linalg.norm(d - kp.desc))
            assert l2 < 1e-3, f"{k}: descriptor L2 {l2}"
            np.testing.assert_allclose(r, [kp.rx, kp.ry, kp.rz])
            checked += 1
    assert checked >= 0.99 * len(oracle.keypoints)


def test_end_to_end_match_against_oracle(rand32, oracle32):
    # Build a deformed partner volume, run both pipelines + matchers,
    # compare the surviving coordinate pairs.
    tar_vol = fixtures.smooth_random_volume((32, 32, 32), seed=8, smooth=2)
    oracle_tar = cpu_sift.run_sift(tar_vol)

    sift = SIFT3D(SiftConfig(max_kp_per_level=512))
    ref_kps = sift.extract(rand32)
    tar_kps = sift.extract(tar_vol)

    rc, tc, valid = enhanced_match(ref_kps, tar_kps, 0.85)
    rc = np.asarray(rc)[np.asarray(valid)]
    tc = np.asarray(tc)[np.asarray(valid)]
    got = {tuple(np.concatenate([a, b])) for a, b in zip(rc, tc)}

    orc, otc = cpu_match.match_coords(oracle32.keypoints, oracle_tar.keypoints, 0.85)
    want = {tuple(np.concatenate([a, b])) for a, b in zip(orc, otc)}

    # near-total agreement; borderline ratio-test flips tolerated
    inter = len(got & want)
    assert inter >= 0.95 * max(len(want), 1), (len(got), len(want), inter)


@pytest.mark.parametrize(
    "cfg_kwargs",
    [
        {"peak_thresh": 0.05},
        {"num_kp_levels": 2},
        {"corner_thresh": 0.2, "max_eig_thres": 0.8},
    ],
)
def test_config_variants_match_oracle(rand32, cfg_kwargs):
    """Factory-parameter plumbing (Include/cSIFT3D.h:187-202): non-default
    configs must flow through both pipelines identically."""
    cfg = SiftConfig(max_kp_per_level=1024, **cfg_kwargs)
    oracle = cpu_sift.run_sift(rand32, cfg)
    sift = SIFT3D(cfg)
    kps = sift.extract(rand32)

    got = set()
    xyz = np.asarray(kps.xyz)
    valid = np.asarray(kps.valid)
    oct_ = np.asarray(kps.octave)
    lev = np.asarray(kps.level)
    for i in range(xyz.shape[0]):
        if valid[i]:
            got.add((int(oct_[i]), int(lev[i]), int(xyz[i, 2]), int(xyz[i, 1]), int(xyz[i, 0])))
    want = {_key(kp) for kp in oracle.keypoints}
    common = len(got & want)
    assert common >= 0.99 * max(len(want), 1), (len(got), len(want), common)


def test_non_cubic_volume_matches_oracle():
    vol = fixtures.smooth_random_volume((40, 48, 32), seed=11, smooth=2)
    oracle = cpu_sift.run_sift(vol)
    sift = SIFT3D(SiftConfig(max_kp_per_level=512))
    kps = sift.extract(vol)
    got = set()
    xyz = np.asarray(kps.xyz)
    valid = np.asarray(kps.valid)
    oct_ = np.asarray(kps.octave)
    lev = np.asarray(kps.level)
    for i in range(xyz.shape[0]):
        if valid[i]:
            got.add((int(oct_[i]), int(lev[i]), int(xyz[i, 2]), int(xyz[i, 1]), int(xyz[i, 0])))
    want = {_key(kp) for kp in oracle.keypoints}
    common = len(got & want)
    assert common >= 0.99 * max(len(want), 1), (len(got), len(want), common)


def test_streaming_single_path_equals_extract(monkeypatch):
    """The large-volume single-extract streaming path — including the
    level-rolled big-octave chain — is bit-identical to extract(): same
    math, only module boundaries move (pipeline._extract_streaming)."""
    import jax.numpy as jnp

    from sift3d_tpu import pipeline
    from sift3d_tpu.pipeline import compact_valid

    shape = (48, 48, 48)
    vol = fixtures.smooth_random_volume(shape, seed=5, smooth=2)
    sift = SIFT3D(SiftConfig(max_kp_per_level=512))
    plain = sift.extract(vol)

    # Force the rolled path for octave 0 and the grouped-stream tail:
    # octave 0 (48^3 = 110,592 voxels) must clear BOTH thresholds — at or
    # above _GROUP_VOXELS it becomes a singleton group, above _ROLL_VOXELS
    # that group rolls level-by-level (incl. the split detect/describe
    # stages and the host-parked keypoint sets).
    monkeypatch.setattr(pipeline, "_ROLL_VOXELS", 100_000)
    monkeypatch.setattr(pipeline, "_GROUP_VOXELS", 100_000)
    stream = sift._extract_streaming(jnp.asarray(vol), shape)

    sc, pc = compact_valid(stream), compact_valid(plain)
    n = int(pc.num_valid)
    assert n > 0
    assert int(sc.num_valid) == n
    np.testing.assert_array_equal(np.asarray(sc.xyz)[:n], np.asarray(pc.xyz)[:n])
    np.testing.assert_array_equal(
        np.asarray(sc.octave)[:n], np.asarray(pc.octave)[:n])
    np.testing.assert_array_equal(np.asarray(sc.desc)[:n], np.asarray(pc.desc)[:n])


def test_streaming_pair_path_equals_extract():
    """The large-volume streaming pair path (one module per octave group,
    seeded by the previous group's gss[num_kp_levels]) is bit-identical to
    extract(): same math restaged (pipeline._extract_pair_streaming)."""
    import jax
    import jax.numpy as jnp

    from sift3d_tpu.pipeline import compact_valid

    shape = (48, 48, 48)
    ref = fixtures.smooth_random_volume(shape, seed=3, smooth=2)
    tar = fixtures.smooth_random_volume(shape, seed=4, smooth=2)
    sift = SIFT3D(SiftConfig(max_kp_per_level=512))
    ka, kb = sift._extract_pair_streaming(
        jnp.asarray(ref), jnp.asarray(tar), shape)
    for stream, vol in ((ka, ref), (kb, tar)):
        plain = sift.extract(vol)
        sc, pc = compact_valid(stream), compact_valid(plain)
        n = int(pc.num_valid)
        assert int(sc.num_valid) == n
        np.testing.assert_array_equal(
            np.asarray(sc.xyz)[:n], np.asarray(pc.xyz)[:n])
        np.testing.assert_array_equal(
            np.asarray(sc.desc)[:n], np.asarray(pc.desc)[:n])
