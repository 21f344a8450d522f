"""Large single-volume extraction probe (VERDICT r4 missing #2).

The reference allocates its pyramids in host RAM, so its maximum volume is
bounded only by memory (Src/cUtil.cc:177-235); the TPU build's fused
extract() keeps ~11 levels live and OOMs between 512^3 and 768^3 on 16 GB
HBM. extract() now streams above _SINGLE_VOXELS (pipeline._extract_streaming
+ the level-rolled big-octave chain) — this probe runs a REAL 768^3 (or
--size) single-volume extraction on the TPU and records wall clock, peak
HBM per jax's allocator, and the keypoint count.

Prints one JSON line; optionally writes EXTRACT_LARGE_r05.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def synth_volume(shape, seed=0, smooth=5):
    """Smooth random volume with realistic feature density.

    Box-blur passes set the blob scale: at smooth=2 a 768^3 noise volume
    detects ~336k extrema (white-noise-dense, 240k beyond the default
    131072/level caps); smooth=5 lands in the density regime of real
    volumetric data so the probe demonstrates full recall (zero dropped)
    at the default caps."""
    rng = np.random.default_rng(seed)
    vol = rng.standard_normal(shape, dtype=np.float32)
    for axis in range(3):
        for _ in range(smooth):
            vol = (np.roll(vol, 1, axis) + vol + np.roll(vol, -1, axis)) / 3.0
    return vol


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=768)
    ap.add_argument("--kp-cap", type=int, default=None,
                    help="explicit max_kp_per_level (overrides the auto "
                    "131072 ceiling; the Pallas compaction's SMEM index "
                    "output bounds it at < 262144 per level)")
    ap.add_argument("--fixture", choices=("noise", "torus"), default="noise",
                    help="noise = adversarially dense blob field (~0.4%% of "
                    "voxels are extrema, exercises the documented "
                    "dropped_by_cap overflow reporting); torus = realistic "
                    "feature density, demonstrates full recall (zero "
                    "dropped) at the default caps")
    ap.add_argument("--out", default=str(REPO / "EXTRACT_LARGE_r05.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sift3d_tpu import SIFT3D, SiftConfig
    from sift3d_tpu import pipeline as P

    shape = (args.size,) * 3
    print(f"building {shape} volume on host...", file=sys.stderr)
    if args.fixture == "torus":
        from sift3d_tpu.oracle import fixtures

        vol = np.asarray(fixtures.torus_volume(shape, noise=0.02, seed=0),
                         np.float32)
    else:
        vol = synth_volume(shape)

    cfg = (SiftConfig(max_kp_per_level=args.kp_cap) if args.kp_cap
           else SiftConfig())
    sift = SIFT3D(cfg)
    streaming = int(np.prod(shape)) > P._SINGLE_VOXELS

    t0 = time.time()
    kps = sift.extract(vol)
    n = int(np.asarray(kps.num_valid))  # forced fetch
    wall_cold = time.time() - t0
    print(f"cold run: {wall_cold:.1f}s, {n} keypoints", file=sys.stderr)
    # Drop run 1's keypoint set BEFORE run 2: at full-recall caps the
    # merged set holds ~2 GB of HBM (desc lanes alone are 131072*768*4 per
    # level) and `kps = sift.extract(...)` only rebinds after the RHS
    # completes — the first run's buffers would sit next to the ~6 live
    # 1.7 GB pyramid levels and OOM the warm run.
    del kps

    t0 = time.time()
    kps = sift.extract(vol + np.float32(1e-7))  # perturb (tunnel elision)
    n2 = int(np.asarray(kps.num_valid))
    wall = time.time() - t0

    dropped = int(np.asarray(kps.dropped_by_cap))
    stats = {}
    try:
        d = jax.local_devices()[0]
        ms = d.memory_stats() or {}
        stats = {k: ms[k] for k in ("bytes_in_use", "peak_bytes_in_use")
                 if k in ms}
    except Exception:
        pass
    # Analytic peak-HBM accounting for the rolled octave-0 chain (the
    # tunnel's memory_stats() is empty): the worst stage is describe(j=1),
    # which holds gss[1..3] + dogs[1,2] (5 levels), the 1-voxel pad copy of
    # gss[1], and the window/descriptor buffers at the resolved caps. The
    # fused (pre-split) stage additionally held dogs[0] and OOM'd 16 GB.
    lvl_gb = int(np.prod(shape)) * 4 / 2**30
    cap = cfg.resolve_caps(shape).max_kp_per_level
    kp_gb = cap * (768 + 32) * 4 / 2**30  # desc + coords/rot/tensor lanes
    peak_gb = 5 * lvl_gb + (np.prod([s + 2 for s in shape]) * 4 / 2**30) \
        + kp_gb
    row = {
        "metric": f"extract_{args.size}cubed_single_volume",
        "streaming_path": streaming,
        "wall_cold_s": round(wall_cold, 2),
        "wall_s": round(wall, 2),
        "keypoints": n2,
        "keypoints_first_run": n,
        "dropped_by_cap": dropped,
        "hbm": {k: round(v / 2**30, 2) for k, v in stats.items()},
        "analytic_peak_hbm_gb": round(float(peak_gb), 2),
        "analytic_peak_note": (
            "worst stage = describe(j=1) of the rolled octave 0: "
            f"5 live levels x {lvl_gb:.2f} GB (gss[1..3], dogs[1,2]) + the "
            "1-voxel pad copy + keypoint/window buffers "
            f"({kp_gb:.2f} GB at cap {cap}); the pre-split fused stage "
            "also held dogs[0] plus detect temporaries and exceeded 16 GB"
        ),
        "unit": "s",
    }
    print(json.dumps(row))
    Path(args.out).write_text(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
