"""Reference debug-utility parity: test_build2sigma (Src/cSIFT3D.cc:322-343)
and the per-voxel descriptor accumulation trace (write_debug_middle,
Src/cUtil.cc:1208-1283)."""

import math

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def _oracle_result(shape=(40, 40, 40), seed=5):
    from sift3d_tpu.config import SiftConfig
    from sift3d_tpu.oracle import cpu_sift, fixtures

    vol = fixtures.smooth_random_volume(shape, seed=seed, smooth=2)
    return cpu_sift.run_sift(vol, SiftConfig()), vol


def test_build2sigma_matches_octave_path():
    """Smooth-by-sqrt(6.4^2-1.6^2)-then-downsample-twice approximates the
    pyramid's own (octave 2, level 1) image (same absolute sigma 6.4 at the
    same 1/4 resolution): blurs compose in quadrature and commute with
    downsampling up to resampling error."""
    from sift3d_tpu.config import SiftConfig
    from sift3d_tpu.oracle import fixtures
    from sift3d_tpu.pipeline import SIFT3D, build2sigma, build_pyramids
    from sift3d_tpu.ops import gaussian as G

    import jax.numpy as jnp

    cfg = SiftConfig()
    vol = fixtures.smooth_random_volume((48, 48, 48), seed=3, smooth=1)
    img = np.asarray(build2sigma(vol, cfg))

    sift = SIFT3D(cfg)
    plan = sift.plan(vol.shape)
    gss, _ = jax.jit(
        lambda v: build_pyramids(G.data_scale(v.astype(jnp.float32)), plan)
    )(jnp.asarray(vol))
    # absolute sigma of GSS (o, i) is sigma0 * k^i * 2^o; 6.4 = (2,1)
    ref = np.asarray(gss[2 * cfg.gss_levels + 1])

    assert img.shape == ref.shape
    # interior comparison: the two orders hit the conv_eps boundary rows in
    # different sequences, so edges differ more than the core
    core = (slice(2, -2),) * 3
    scale = float(np.abs(ref[core]).max()) + 1e-12
    rel = float(np.abs(img[core] - ref[core]).max()) / scale
    assert rel < 0.05, rel


def test_descriptor_voxel_trace_reconstructs_descriptor(tmp_path):
    """Scatter-adding the trace's (offsets, accum) pairs and re-normalising
    reproduces the oracle keypoint's final descriptor exactly — the trace is
    a complete record of every accumulation the descriptor loop performs."""
    from sift3d_tpu.config import DESC_NUMEL
    from sift3d_tpu.oracle.cpu_sift import _normalize_desc
    from sift3d_tpu.utils.dump import descriptor_voxel_trace, write_descriptor_trace

    from sift3d_tpu.config import SiftConfig

    res, _ = _oracle_result()
    assert res.keypoints, "fixture produced no keypoints"
    gl = SiftConfig().gss_levels

    checked = 0
    for kp in res.keypoints[:5]:
        level = res.gss[kp.octave * gl + kp.level]
        trace = descriptor_voxel_trace(kp, level)

        desc = np.zeros(DESC_NUMEL, np.float32)
        ok = trace["offsets"] >= 0
        np.add.at(desc, trace["offsets"][ok], trace["accum"][ok])
        desc = _normalize_desc(desc)
        desc = np.minimum(desc, np.float32(0.2 * 128 / DESC_NUMEL))
        desc = _normalize_desc(desc)
        np.testing.assert_allclose(desc, kp.desc, atol=2e-6)

        # contributing voxels hit a face and carry finite barycentrics
        hit = trace["intersect_id"] >= 0
        assert hit.any()
        b = trace["bary"][hit]
        np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-4)
        checked += 1

        if checked == 1:
            p = tmp_path / "trace.txt"
            write_descriptor_trace(p, kp, trace)
            text = p.read_text()
            first = text.splitlines()[0].split(", ")
            assert float(first[0]) == kp.x
            assert abs(float(first[3]) - kp.scale) < 1e-6
            # one line per window voxel (+ header 2 + trailing blanks)
            n_lines = sum(
                1 for ln in text.splitlines() if ln.count(",") == 15
            )
            assert n_lines == trace["loop_point"].shape[0]
    assert checked >= 1


def test_retry_transient_classification_and_backoff():
    from sift3d_tpu.utils.retry import is_transient, retry_transient

    assert is_transient(RuntimeError("UNAVAILABLE: socket closed"))
    assert is_transient(RuntimeError("DEADLINE_EXCEEDED waiting for tunnel"))
    assert not is_transient(RuntimeError("RESOURCE_EXHAUSTED: OOM 16GB"))
    assert not is_transient(RuntimeError("INVALID_ARGUMENT: bad shape"))
    # UNAVAILABLE+RESOURCE_EXHAUSTED together: permanent wins (no retry loop)
    assert not is_transient(RuntimeError("UNAVAILABLE RESOURCE_EXHAUSTED"))

    calls = []

    @retry_transient(attempts=3, base_delay_s=0.0)
    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("UNAVAILABLE: connection reset")
        return "ok"

    assert flaky() == "ok"
    assert len(calls) == 3

    @retry_transient(attempts=3, base_delay_s=0.0)
    def permanent():
        calls.append(2)
        raise RuntimeError("INVALID_ARGUMENT: nope")

    import pytest
    n0 = len(calls)
    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        permanent()
    assert len(calls) == n0 + 1  # no retries on permanent errors
