"""Large-volume parity vs the NumPy oracle (VERDICT round-1 item 6).

The 32^3 tests in test_pipeline.py pin down per-stage semantics; these
slow-marked tests re-verify the whole-pipeline contract at 64^3 and 128^3 —
the scale where boundary handling, per-level thresholds and window clamping
have real room to drift:

- the DETECTED extremum set (any status) must match the oracle exactly
  (reference scan of Src/cSIFT3D.cc:362-425);
- orientation accept/reject decisions agree on >= 99.5% of detections
  (borderline eigenvalue/corner flips are genuine float-order ambiguity);
- of the commonly-accepted keypoints, >= 99.5% have descriptor L2 < 1e-3
  (BASELINE descriptor-parity bar) and ALL are < 5e-3. Measured at 128^3:
  759/761 under 1e-3, worst 1.6e-3 — the outliers are volume-boundary
  keypoints where bins at the truncate(0.0333)->renormalise threshold
  (Src/cSIFT3D.cc:1350-1358) flip sides under float summation order.
"""

import os

import numpy as np
import pytest

from sift3d_tpu import SIFT3D, SiftConfig
from sift3d_tpu.oracle import cpu_sift, fixtures

# 128^3 runs the single-thread oracle for ~30+ min; on-demand only
# (SIFT3D_HEAVY_TESTS=1). Its measured evidence is committed in
# PARITY_SCALE.json.
HEAVY = os.environ.get("SIFT3D_HEAVY_TESTS") == "1"
SIZES = [64, 128] if HEAVY else [64]


def _detected(kps):
    """(octave, level, z, y, x) -> (status, desc) for every detected lane."""
    xyz = np.asarray(kps.xyz)
    desc = np.asarray(kps.desc)
    status = np.asarray(kps.status)
    oct_ = np.asarray(kps.octave)
    lev = np.asarray(kps.level)
    out = {}
    for i in np.nonzero(status != 0)[0]:
        key = (int(oct_[i]), int(lev[i]),
               int(xyz[i, 2]), int(xyz[i, 1]), int(xyz[i, 0]))
        out[key] = (int(status[i]), desc[i])
    return out


@pytest.mark.slow
@pytest.mark.parametrize("size", SIZES)
def test_scale_parity(size):
    vol = fixtures.smooth_random_volume((size,) * 3, seed=5, smooth=2)
    sift = SIFT3D(SiftConfig(max_kp_per_level=8192))
    kps = sift.extract(vol)
    oracle = cpu_sift.run_sift(vol)

    got = _detected(kps)
    accepted_desc = {
        (kp.octave, kp.level, kp.z, kp.y, kp.x): kp.desc
        for kp in oracle.keypoints
    }
    want = {
        (kp.octave, kp.level, kp.z, kp.y, kp.x): kp.status
        for kp in oracle.all_extrema
    }

    # detection set exact
    assert set(got) == set(want), (
        f"detections differ: tpu-only={len(set(got) - set(want))} "
        f"oracle-only={len(set(want) - set(got))}"
    )

    # orientation decisions
    flips = sum(1 for k in want if (got[k][0] == 1) != (want[k] == 1))
    assert flips <= max(1, 0.005 * len(want)), f"{flips}/{len(want)} flips"

    # descriptor parity on commonly-accepted keypoints
    common = [k for k in accepted_desc if got[k][0] == 1]
    assert common
    l2 = np.array([
        float(np.linalg.norm(got[k][1] - accepted_desc[k])) for k in common
    ])
    bad = int(np.sum(l2 >= 1e-3))
    assert bad <= max(1, int(0.005 * len(common))), (
        f"{bad}/{len(common)} descriptors exceed 1e-3 L2"
    )
    assert float(l2.max()) < 5e-3, f"worst descriptor L2 {l2.max()}"
