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
    # free the dump's device pyramids before extract() builds its own set:
    # at 512^3 two live pyramid sets (~3.2 GB each) exhaust HBM.
    del gss, dog

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


def descriptor_voxel_trace(kp, level) -> dict[str, np.ndarray]:
    """Per-voxel descriptor accumulation trace for one oracle keypoint
    (the reference's write_debug_middle instrumentation,
    Src/cUtil.cc:1208-1283 + Src/cSIFT3D.cc:1240-1363 debug branches).

    Returns arrays over the keypoint's scan-order window voxels:
      loop_point (N,3) x,y,z; vrot (N,3) weighted rotated gradient;
      vbins (N,3) shifted bin coords; intersect_id (N,); bary (N,3);
      dvbins (N,3) floorf fractions; offsets (N,8,3) int32 descriptor
      offsets (-1 where the corner was skipped); accum (N,8,3) the values
      added. Voxels rejected before the debug capture points hold zeros
      with intersect_id = -1, matching the uninitialised-slot semantics of
      the reference buffers only loosely (we zero instead of leaving junk).
    """
    import math

    from ..config import (
        DESC_RAD_FCTR,
        DESC_SIG_FCTR,
        IMG_BORDER,
        NHIST_PER_DIM,
    )
    from ..geometry import TRI_IDX
    from ..oracle.cpu_sift import _cart2bary_first_face

    F32 = np.float32
    gau = level.data
    nz, ny, nx = gau.shape
    u = F32(level.unit)
    sigma = F32(kp.scale) * F32(DESC_SIG_FCTR)
    win_radius = F32(DESC_RAD_FCTR) * sigma
    desc_hw = win_radius / F32(math.sqrt(2))
    desc_bin_fctr = F32(NHIST_PER_DIM) / (F32(2.0) * desc_hw)

    cx, cy, cz = F32(kp.x), F32(kp.y), F32(kp.z)

    def rng(c, n):
        start = int(math.floor(float(F32(c - win_radius / u))))
        start = start if start > 1 else IMG_BORDER
        end = int(math.ceil(float(F32(c + win_radius / u))))
        end = end if end < (n - 2) else n - 1 - IMG_BORDER
        return start, end

    x0, x1 = rng(cx, nx)
    y0, y1 = rng(cy, ny)
    z0, z1 = rng(cz, nz)

    zs, ys, xs = np.meshgrid(
        np.arange(z0, z1 + 1), np.arange(y0, y1 + 1), np.arange(x0, x1 + 1),
        indexing="ij",
    )
    zs, ys, xs = (a.ravel() for a in (zs, ys, xs))
    n = xs.size

    out = {
        "loop_point": np.stack([xs, ys, zs], -1).astype(F32),
        "vrot": np.zeros((n, 3), F32),
        "vbins": np.zeros((n, 3), F32),
        "intersect_id": np.full(n, -1, np.int32),
        "bary": np.zeros((n, 3), F32),
        "dvbins": np.zeros((n, 3), F32),
        "offsets": np.full((n, 8, 3), -1, np.int32),
        "accum": np.zeros((n, 8, 3), F32),
        # post-descriptor keypoints already hold the descriptor-frame R^T
        # (the reference's in-place Transpose_Matrix, Src/cSIFT3D.cc:1214)
        "rotation": kp.rotation.astype(F32),
    }

    dx = (xs.astype(F32) - cx) * u
    dy = (ys.astype(F32) - cy) * u
    dz = (zs.astype(F32) - cz) * u
    sq = dx * dx + dy * dy + dz * dz
    alive = sq <= win_radius * win_radius  # sphere test precedes capture

    Rt = kp.rotation.astype(F32)  # already descriptor-frame (see above)
    disp = np.stack([dx, dy, dz], -1)
    vrot_pos = disp @ Rt.T
    vbins = (vrot_pos + desc_hw) * desc_bin_fctr - F32(0.5)
    in_box = ~np.any((vbins <= -0.5) | (vbins >= 3.5), axis=-1)
    alive = alive & in_box
    out["vbins"][alive] = vbins[alive]

    w = np.exp(F32(-0.5) * sq / (sigma * sigma)).astype(F32)
    gx = F32(0.5) * (gau[zs, ys, xs + 1] - gau[zs, ys, xs - 1]) / u
    gy = F32(0.5) * (gau[zs, ys + 1, xs] - gau[zs, ys - 1, xs]) / u
    gz = F32(0.5) * (gau[zs + 1, ys, xs] - gau[zs - 1, ys, xs]) / u
    grad_rot = (np.stack([gx, gy, gz], -1) * w[..., None]) @ Rt.T
    out["vrot"][alive] = grad_rot[alive]

    face_idx, bary = _cart2bary_first_face(grad_rot.astype(F32))
    dvb = (vbins - np.floor(vbins)).astype(F32)
    out["intersect_id"][alive] = face_idx[alive]
    out["bary"][alive] = bary[alive]
    out["dvbins"][alive] = dvb[alive]

    alive = alive & (face_idx >= 0)
    mag = np.sqrt(np.sum(grad_rot * grad_rot, -1)).astype(F32)
    base = vbins.astype(np.int32)
    vert_ids = np.asarray(TRI_IDX)[np.clip(face_idx, 0, 19)]

    corner = 0
    for dxb in range(2):
        for dyb in range(2):
            for dzb in range(2):
                bx = base[:, 0] + dxb
                by = base[:, 1] + dyb
                bz = base[:, 2] + dzb
                ok = (
                    alive
                    & (bx >= 0) & (by >= 0) & (bz >= 0)
                    & (bx < NHIST_PER_DIM) & (by < NHIST_PER_DIM)
                    & (bz < NHIST_PER_DIM)
                )
                wx = np.where(dxb == 0, 1.0 - dvb[:, 0], dvb[:, 0])
                wy = np.where(dyb == 0, 1.0 - dvb[:, 1], dvb[:, 1])
                wz = np.where(dzb == 0, 1.0 - dvb[:, 2], dvb[:, 2])
                wgt = (wx * wy * wz).astype(F32) * mag
                hist = bx + by * NHIST_PER_DIM + bz * NHIST_PER_DIM ** 2
                off = hist[:, None] * 12 + vert_ids  # (N, 3)
                out["offsets"][ok, corner] = off[ok]
                out["accum"][ok, corner] = (wgt[:, None] * bary)[ok]
                corner += 1
    return out


def write_descriptor_trace(path, kp, trace: dict) -> None:
    """Append one keypoint's voxel trace in the reference's text layout
    (Src/cUtil.cc:1208-1283: header 'x, y, z, scale' + R rows, then one
    line per voxel: loop_point, vrot, vbins, intersect_id, bary, dvbins)."""
    R = trace["rotation"].ravel()
    with open(path, "a") as out:
        out.write(f"{kp.x:.6f}, {kp.y:.6f}, {kp.z:.6f}, {kp.scale:.6f}\n")
        out.write(
            ", ".join(f"{v:.6f}" for v in R[:4])
            + ", " + ", ".join(f"{v:.6f}" for v in R[4:8])
            + f", {R[8]:.6f}\n"
        )
        for j in range(trace["loop_point"].shape[0]):
            lp = trace["loop_point"][j]
            vr = trace["vrot"][j]
            vb = trace["vbins"][j]
            ba = trace["bary"][j]
            dv = trace["dvbins"][j]
            out.write(
                f"{lp[0]:.6f}, {lp[1]:.6f}, {lp[2]:.6f}, "
                f"{vr[0]:.6f}, {vr[1]:.6f}, {vr[2]:.6f}, "
                f"{vb[0]:.6f}, {vb[1]:.6f}, {vb[2]:.6f}, "
                f"{int(trace['intersect_id'][j])}, "
                f"{ba[0]:.6f}, {ba[1]:.6f}, {ba[2]:.6f}, "
                f"{dv[0]:.6f}, {dv[1]:.6f}, {dv[2]:.6f}\n"
            )
        out.write("\n\n\n\n\n")


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
