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


def synth_volume(shape, seed=0):
    """Smooth-ish random volume built in slabs to keep host RAM modest."""
    rng = np.random.default_rng(seed)
    vol = rng.standard_normal(shape, dtype=np.float32)
    # cheap separable smoothing on host (box blur x2 per axis) so the
    # volume has detectable blob structure instead of white noise
    for axis in range(3):
        for _ in range(2):
            vol = (np.roll(vol, 1, axis) + vol + np.roll(vol, -1, axis)) / 3.0
    return vol


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=768)
    ap.add_argument("--out", default=str(REPO / "EXTRACT_LARGE_r05.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sift3d_tpu import SIFT3D, SiftConfig
    from sift3d_tpu import pipeline as P

    shape = (args.size,) * 3
    print(f"building {shape} volume on host...", file=sys.stderr)
    vol = synth_volume(shape)

    cfg = SiftConfig()
    sift = SIFT3D(cfg)
    streaming = int(np.prod(shape)) > P._SINGLE_VOXELS

    t0 = time.time()
    kps = sift.extract(vol)
    n = int(np.asarray(kps.num_valid))  # forced fetch
    wall_cold = time.time() - t0

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
    row = {
        "metric": f"extract_{args.size}cubed_single_volume",
        "streaming_path": streaming,
        "wall_cold_s": round(wall_cold, 2),
        "wall_s": round(wall, 2),
        "keypoints": n2,
        "keypoints_first_run": n,
        "dropped_by_cap": dropped,
        "hbm": {k: round(v / 2**30, 2) for k, v in stats.items()},
        "unit": "s",
    }
    print(json.dumps(row))
    Path(args.out).write_text(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
