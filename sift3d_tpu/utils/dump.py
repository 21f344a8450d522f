"""First-class dump-and-diff parity harness.

The reference's de-facto verification is ~700 LoC of debug writers that dump
every intermediate to text files for manual diffing (Src/cUtil.cc:607-1321,
SURVEY.md §4). This module makes that protocol structured: dump every
pipeline intermediate (GSS/DoG levels, detection thresholds and coordinate
sets, orientation statuses/rotations, descriptors, matches) to one .npz
archive, and diff two archives (e.g. TPU pipeline vs CPU oracle) with
per-stage tolerances.
"""

from __future__ import annotations

import numpy as np

import jax


def dump_tpu(volume, cfg=None) -> dict[str, np.ndarray]:
    """Run the TPU pipeline on `volume` and collect all intermediates."""
    from ..config import SiftConfig
    from ..ops import gaussian as G
    from ..pipeline import SIFT3D, build_pyramids

    cfg = cfg or SiftConfig()
    sift = SIFT3D(cfg)
    vol = np.asarray(volume, np.float32)
    plan = sift.plan(vol.shape)

    out: dict[str, np.ndarray] = {}
    gss, dog = jax.jit(
        lambda v: build_pyramids(G.data_scale(v), plan)
    )(vol)
    gl, dl = cfg.gss_levels, cfg.dog_levels
    for o in range(plan.num_octaves):
        for i in range(gl):
            out[f"gss_{o}_{i}"] = np.asarray(gss[o * gl + i])
        for i in range(dl):
            out[f"dog_{o}_{i}"] = np.asarray(dog[o * dl + i])

    kps = sift.extract(vol)
    for field in ("xyz", "rxyz", "octave", "level", "scale", "rotation",
                  "desc", "status", "valid", "counts"):
        out[f"kp_{field}"] = np.asarray(getattr(kps, field))
    return out


def dump_oracle(volume, cfg=None) -> dict[str, np.ndarray]:
    """Run the CPU oracle on `volume` and collect matching intermediates."""
    from ..config import SiftConfig
    from ..oracle import cpu_sift

    cfg = cfg or SiftConfig()
    res = cpu_sift.run_sift(np.asarray(volume, np.float32), cfg)
    out: dict[str, np.ndarray] = {}
    gl, dl = cfg.gss_levels, cfg.dog_levels
    noct = len(res.gss) // gl
    for o in range(noct):
        for i in range(gl):
            out[f"gss_{o}_{i}"] = res.gss[o * gl + i].data
        for i in range(dl):
            out[f"dog_{o}_{i}"] = res.dog[o * dl + i].data

    kps = res.keypoints
    out["kp_keys"] = np.array(
        [[k.octave, k.level, k.z, k.y, k.x] for k in kps], np.int32
    ).reshape(-1, 5)
    out["kp_desc"] = (
        np.stack([k.desc for k in kps]) if kps else np.zeros((0, 768), np.float32)
    )
    out["kp_rxyz"] = np.array(
        [[k.rx, k.ry, k.rz] for k in kps], np.float32
    ).reshape(-1, 3)
    out["extrema_keys"] = np.array(
        [[k.octave, k.level, k.z, k.y, k.x, k.status] for k in res.all_extrema],
        np.int32,
    ).reshape(-1, 6)
    return out


def diff_dumps(tpu: dict, oracle: dict, desc_l2_tol: float = 1e-3) -> dict:
    """Compare a TPU dump against an oracle dump. Returns a report dict;
    'ok' is True when every stage is within tolerance."""
    report: dict = {"levels": {}, "ok": True}

    for key in sorted(k for k in oracle if k.startswith(("gss_", "dog_"))):
        a, b = tpu[key], oracle[key]
        d = float(np.max(np.abs(a - b)))
        report["levels"][key] = d
        if d > 1e-4:
            report["ok"] = False

    # keypoint set equality (octave, level, z, y, x of accepted keypoints)
    status = tpu["kp_status"]
    valid = tpu["kp_valid"]
    xyz = tpu["kp_xyz"]
    oct_, lev = tpu["kp_octave"], tpu["kp_level"]
    tpu_keys = {
        (int(oct_[i]), int(lev[i]), int(xyz[i, 2]), int(xyz[i, 1]), int(xyz[i, 0]))
        for i in range(len(valid)) if valid[i]
    }
    orc_keys = {tuple(int(v) for v in row) for row in oracle["kp_keys"]}
    report["kp_tpu"] = len(tpu_keys)
    report["kp_oracle"] = len(orc_keys)
    report["kp_common"] = len(tpu_keys & orc_keys)
    if tpu_keys != orc_keys:
        report["ok"] = report["kp_common"] >= 0.99 * max(len(orc_keys), 1)

    # descriptor L2 for common keypoints
    tpu_map = {}
    for i in range(len(valid)):
        if valid[i]:
            tpu_map[
                (int(oct_[i]), int(lev[i]), int(xyz[i, 2]), int(xyz[i, 1]), int(xyz[i, 0]))
            ] = tpu["kp_desc"][i]
    worst = 0.0
    for row, d_orc in zip(oracle["kp_keys"], oracle["kp_desc"]):
        key = tuple(int(v) for v in row)
        if key in tpu_map:
            worst = max(worst, float(np.linalg.norm(tpu_map[key] - d_orc)))
    report["desc_l2_worst"] = worst
    if worst > desc_l2_tol:
        report["ok"] = False
    return report
