"""Roofline evidence for the extract+match pipeline (BASELINE north-star).

For each pipeline stage this measures *device* time (its own xplane trace,
so tunnel/host latency is excluded), models the HBM bytes it must touch and
the MXU FLOPs it performs, and reports achieved GB/s and FLOP/s against the
chip's peaks. The HBM peak is *measured* on the spot with a device-to-device
copy (honest speed-of-light denominator), the MXU peak taken from the chip
spec table.

The bytes model is a lower bound (compulsory traffic): each stage's inputs
read once + outputs written once; intermediates that XLA keeps in VMEM are
not charged. A stage at >=50% of the copy roofline is HBM-bound; a stage far
below either roofline has op-overhead or compute-bound kernels (see
DESIGN.md for which).

Usage: python benchmarks/roofline.py [--size 256] -> ROOFLINE.json
"""

from __future__ import annotations

import argparse
import json
import shutil
import time
from pathlib import Path

REPO = Path(__file__).parent.parent

# chip spec peaks (TPU v5e / v5lite): HBM ~819 GB/s, bf16 MXU ~394 TFLOP/s.
SPEC = {"hbm_gbps": 819.0, "mxu_bf16_tflops": 394.0}


def measure_hbm_peak() -> float:
    """Measured streaming bandwidth (read+write GB/s) on a 512 MB array.

    The whole rep loop runs on-device in ONE dispatch (fori_loop) so tunnel
    round-trips don't pollute the timing; `y + 1` (not `* 1.0`) so XLA
    cannot algebraically elide the pass."""
    import jax
    import jax.numpy as jnp

    n = 128 * 1024 * 1024  # 512 MB f32
    reps = 50
    x = jnp.zeros(n, dtype=jnp.float32)

    @jax.jit
    def sweep(x):
        return jax.lax.fori_loop(0, reps, lambda i, y: y + 1.0, x)

    jax.block_until_ready(sweep(x))  # compile
    t0 = time.perf_counter()
    y = sweep(x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / reps
    return 2 * n * 4 / dt / 1e9  # read + write per rep


def device_ms_of(trace_dir: str) -> float:
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from device_profile import parse_xspace

    _, _, total_ps = parse_xspace(trace_dir)
    return total_ps / 1e9


def bytes_model(size: int, cfg, plan, n_kp: int, win_shapes, match_n: int,
                match_m: int):
    """Compulsory HBM bytes + MXU FLOPs per stage, for ONE volume pair."""
    gl, dl = cfg.gss_levels, cfg.dog_levels
    f = 4  # f32

    # Pyramid: per blur, 3 smoothing-matrix einsums each read+write the
    # volume (6V); DoG reads 2 levels writes 1 (3V); downsample ~1.1V.
    vol_b = size ** 3 * f
    oct_scale = sum(0.125 ** o for o in range(plan.num_octaves))
    blurs = gl - 1 + 1  # per octave + base blur
    pyr_bytes = (blurs * 6 + (dl * 3) + 1.1) * vol_b * oct_scale
    # FLOPs: each axis-einsum is (size, size) @ (size, V/size) per axis.
    pyr_flops = blurs * 3 * 2 * size * vol_b / f * oct_scale

    # Detection: read 3 DoG levels per detect level + write masks/indices.
    det_bytes = (dl - 2) * 3 * vol_b * oct_scale * 1.2

    # Orientation + descriptor: windows gathered (read W^3 per kp from the
    # level + write (B, C) gradients x3 + kernel reads them back).
    def win_bytes(wshape):
        C = (wshape[0] - 2) * (wshape[1] - 2) * (wshape[2] - 2)
        return (wshape[0] * wshape[1] * wshape[2] + 6 * C) * f

    ori_bytes = n_kp * win_bytes(win_shapes["ori"])
    desc_bytes = n_kp * (win_bytes(win_shapes["desc"]) + 768 * f)

    # Match: forward + reverse top-2 over (N, 768) x (768, M), f32-HIGHEST
    # = 6 bf16 passes; scores stay in VMEM per chunk.
    match_bytes = 2 * (match_n + match_m) * 768 * f
    match_flops = 2 * 2 * match_n * match_m * 768 * 3  # 2 dirs x 3 passes eff

    return {
        "pyramids": {"bytes": 2 * pyr_bytes, "flops": 2 * pyr_flops},
        "levels": {
            "bytes": 2 * (det_bytes + ori_bytes + desc_bytes),
            "flops": 0.0,
        },
        "match": {"bytes": match_bytes, "flops": match_flops},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--kp-cap", type=int, default=16384)
    ap.add_argument("--out", default=str(REPO / "ROOFLINE.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from bench import bench_pair
    from sift3d_tpu import SIFT3D, SiftConfig, enhanced_match
    from sift3d_tpu.pipeline import compact_valid
    from sift3d_tpu.ops.match import ENHANCED, match_descriptors, match_coords
    from sift3d_tpu.ops import windows as W
    from sift3d_tpu.config import (
        DESC_RAD_FCTR, DESC_SIG_FCTR, ORI_RAD_FCTR, ORI_SIG_FCTR,
    )

    shape = (args.size,) * 3
    cfg = SiftConfig(max_kp_per_level=args.kp_cap)
    sift = SIFT3D(cfg)
    ref_np, tar_np = bench_pair(shape)
    plan = sift.plan(shape)

    # warm-up / compile
    ref = jax.device_put(ref_np)
    tar = jax.device_put(tar_np)
    kr = sift.extract(ref)
    kt = sift.extract(tar)
    kr_c, kt_c = compact_valid(kr), compact_valid(kt)
    out = enhanced_match(kr, kt, 0.85)
    jax.block_until_ready(out)

    hbm_gbps = measure_hbm_peak()

    stages = {}

    def run_stage(name, fn):
        d = f"/tmp/sift_roofline/{name}"
        shutil.rmtree(d, ignore_errors=True)
        ref_d = jax.device_put(ref_np)
        tar_d = jax.device_put(tar_np)
        jax.block_until_ready((ref_d, tar_d))
        with jax.profiler.trace(d):
            out = fn(ref_d, tar_d)
            jax.block_until_ready(out)
        stages[name] = {"device_ms": round(device_ms_of(d), 2)}

    def stage_pyr(r, t):
        return (sift._pyramids(r, shape, plan), sift._pyramids(t, shape, plan))

    pyr_cache = {}

    def stage_levels(r, t):
        gr, dr = sift._pyramids(r, shape, plan)
        gt, dt = sift._pyramids(t, shape, plan)
        jax.block_until_ready((gr, gt))
        # re-trace only the level work: new trace dir below captures all ops
        # since the pyramid results are ready before entering.
        return (sift._octaves(gr, dr, shape, plan),
                sift._octaves(gt, dt, shape, plan))

    def stage_match(r, t):
        res = match_descriptors(
            kr_c.desc, kt_c.desc, kr_c.valid, kt_c.valid, 0.85, mode=ENHANCED
        )
        return match_coords(kr_c.rxyz, kt_c.rxyz, res)

    run_stage("pyramids", stage_pyr)
    run_stage("levels_incl_pyramids", stage_levels)
    run_stage("match", stage_match)

    # levels device time = combined trace minus the pyramid recompute
    lvl_ms = max(
        stages["levels_incl_pyramids"]["device_ms"]
        - stages["pyramids"]["device_ms"],
        0.0,
    )
    stages["levels"] = {"device_ms": round(lvl_ms, 2)}
    del stages["levels_incl_pyramids"]

    n_kp = int(np.asarray(kr.num_valid)) + int(np.asarray(kt.num_valid))

    def wsz(rad_f, sig_f):
        import math
        scale = float(plan.gss_meta(0, 1).scale)
        sig = sig_f * scale
        r_vox = W.radius_voxels(rad_f * sig, plan.gss_meta(0, 1).unit)
        wdim = W.window_size(r_vox, args.size + 2)
        return (wdim,) * 3

    model = bytes_model(
        args.size, cfg, plan, n_kp,
        {"ori": wsz(ORI_RAD_FCTR, ORI_SIG_FCTR),
         "desc": wsz(DESC_RAD_FCTR, DESC_SIG_FCTR)},
        kr_c.desc.shape[0], kt_c.desc.shape[0],
    )

    for name, row in stages.items():
        m = model.get(name)
        if not m or row["device_ms"] <= 0:
            continue
        secs = row["device_ms"] / 1e3
        row["model_gb"] = round(m["bytes"] / 1e9, 3)
        row["achieved_gbps"] = round(m["bytes"] / 1e9 / secs, 1)
        row["pct_hbm_peak"] = round(100 * row["achieved_gbps"] / hbm_gbps, 1)
        if m["flops"]:
            row["model_gflop"] = round(m["flops"] / 1e9, 1)
            row["achieved_tflops"] = round(m["flops"] / 1e12 / secs, 2)
            row["pct_mxu_peak"] = round(
                100 * row["achieved_tflops"] / SPEC["mxu_bf16_tflops"], 1
            )

    report = {
        "size": args.size,
        "measured_hbm_copy_gbps": round(hbm_gbps, 1),
        "spec": SPEC,
        "stages": stages,
        "note": (
            "bytes are compulsory-traffic lower bounds; 'levels' combines "
            "detection+orientation+descriptor whose Pallas kernels are "
            "VPU-compute-bound, not HBM-bound (see DESIGN.md)"
        ),
    }
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(REPO))
    main()
