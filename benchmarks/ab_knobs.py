"""A/B a kernel env knob on the real-TPU 256^3 bench with a parity gate.

Runs extract_pair + enhancedMatch at --size with the given env knobs (set
BEFORE jax import so import-time kernel constants pick them up), reports
median steady-state wall clock, and — against a baseline .npz recorded with
--record — checks the full parity gate: identical keypoint (o,l,z,y,x)
sets, identical match pair sets, and max descriptor L2 delta.

Usage:
  # record the baseline configuration once
  python benchmarks/ab_knobs.py --record /tmp/ab_base.npz
  # then A/B a knob
  SIFT3D_ACCUM_PRECISION=3pass python benchmarks/ab_knobs.py --vs /tmp/ab_base.npz

Prints one JSON line; exits 1 if the parity gate fails.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

KNOBS = ("SIFT3D_ACCUM_PRECISION", "SIFT3D_ACCUM_GROUP", "SIFT3D_DESC_TILE",
         "SIFT3D_FACE_MXU", "SIFT3D_BLUR_PRECISION", "SIFT3D_MATCH_PRECISION",
         "USE_PALLAS_BLUR", "SIFT3D_KP_BLOCK", "SIFT3D_FACE_SELECT",
         "SIFT3D_DESC_SPHERE", "SIFT3D_SPHERE_NOSCRATCH")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--record", default=None, help="write baseline npz")
    ap.add_argument("--vs", default=None, help="compare against baseline npz")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from bench import bench_pair
    from sift3d_tpu import SIFT3D, SiftConfig, enhanced_match

    shape = (args.size,) * 3
    ref_np, tar_np = bench_pair(shape)
    kp_block = int(os.environ.get("SIFT3D_KP_BLOCK", "0"))
    cfg = SiftConfig(kp_block=kp_block) if kp_block else SiftConfig()
    sift = SIFT3D(cfg)
    sift.warmup(shape, pair=True)

    def step(rv, tv):
        kr, kt = sift.extract_pair(rv, tv)
        rc, tc, valid = enhanced_match(kr, kt, 0.85)
        return kr, kt, rc, tc, valid

    out = step(jax.device_put(ref_np), jax.device_put(tar_np))
    jax.block_until_ready(out)

    times = []
    for _ in range(args.runs):
        rv = jax.device_put(ref_np)
        tv = jax.device_put(tar_np)
        jax.block_until_ready((rv, tv))
        t0 = time.time()
        out = step(rv, tv)
        jax.block_until_ready(out)
        times.append(time.time() - t0)

    kr, kt, rc, tc, valid = out
    v = np.asarray(valid)

    def kp_arrays(k):
        val = np.asarray(k.valid)
        keys = np.stack([
            np.asarray(k.octave)[val], np.asarray(k.level)[val],
            np.asarray(k.xyz)[val][:, 2], np.asarray(k.xyz)[val][:, 1],
            np.asarray(k.xyz)[val][:, 0]], axis=1)
        order = np.lexsort(keys.T[::-1])
        return keys[order], np.asarray(k.desc)[val][order]

    rk, rdesc = kp_arrays(kr)
    tk, tdesc = kp_arrays(kt)
    matches = np.concatenate([np.asarray(rc)[v], np.asarray(tc)[v]], axis=1)

    result = {
        "knobs": {k: os.environ.get(k) for k in KNOBS if os.environ.get(k)},
        "size": args.size,
        "wall_s": round(float(np.median(times)), 4),
        "times": [round(t, 4) for t in times],
        "ref_kps": int(rk.shape[0]), "tar_kps": int(tk.shape[0]),
        "matches": int(v.sum()),
    }

    if args.record:
        np.savez(args.record, rk=rk, tk=tk, rdesc=rdesc, tdesc=tdesc,
                 matches=matches, wall=np.float64(result["wall_s"]))
        result["recorded"] = args.record
    ok = True
    if args.vs:
        base = np.load(args.vs)
        kp_equal = (base["rk"].shape == rk.shape and (base["rk"] == rk).all()
                    and base["tk"].shape == tk.shape and (base["tk"] == tk).all())
        def _rowsort(m):
            # lexicographic whole-row sort: per-column sorting would let two
            # different pairings over the same coordinate multisets compare
            # equal (advisor r3)
            return m[np.lexsort(m.T[::-1])] if m.size else m

        m_equal = (base["matches"].shape == matches.shape
                   and np.allclose(
                       _rowsort(base["matches"]),
                       _rowsort(matches), atol=1e-3))
        desc_d = None
        over = None
        if kp_equal:
            dl2 = np.concatenate([
                np.linalg.norm(base["rdesc"] - rdesc, axis=-1),
                np.linalg.norm(base["tdesc"] - tdesc, axis=-1),
            ]) if rdesc.size else np.zeros(0)
            desc_d = float(dl2.max(initial=0))
            over = int((dl2 > 1e-3).sum())
        result.update({
            "kp_sets_equal": bool(kp_equal),
            "match_sets_equal": bool(m_equal),
            "desc_l2_worst": desc_d,
            "desc_over_1e3": over,
            "baseline_wall_s": float(base["wall"]),
            "speedup": round(float(base["wall"]) / result["wall_s"], 3),
        })
        # Gate = BASELINE.md "Amended parity bar": keypoint and match sets
        # identical; descriptors L2 < 1e-3 for >= 99% of keypoints with
        # worst < 5e-3 (face-edge flips move ~1e-3 of mass between vertex
        # bins whenever ANY float op order changes — DESC_TAIL_256.json).
        # A bit-identical knob still reports desc_l2_worst == 0 for the
        # stronger claim.
        nkp = max(rk.shape[0] + tk.shape[0], 1)
        ok = kp_equal and m_equal and (
            desc_d is None
            or (desc_d < 5e-3 and over <= max(1, round(0.01 * nkp)))
        )
        result["parity_ok"] = bool(ok)

    print(json.dumps(result))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
