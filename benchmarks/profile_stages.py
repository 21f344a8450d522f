"""Stage-level wall/device profile of the 256^3 extract+match pair.

Prints a JSON breakdown: pyramid build, per-level stages (aggregate),
merge, compaction, match — wall-clock with block_until_ready per stage,
plus total dispatch counts. Run after bench.py so the compile cache is warm.

Usage: python benchmarks/profile_stages.py [--size 256]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--kp-cap", type=int, default=16384)
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from bench import bench_pair
    from sift3d_tpu import SIFT3D, SiftConfig, enhanced_match
    from sift3d_tpu.pipeline import compact_valid
    from sift3d_tpu.ops.match import ENHANCED, match_descriptors, match_coords

    shape = (args.size,) * 3
    cfg = SiftConfig(max_kp_per_level=args.kp_cap)
    sift = SIFT3D(cfg)
    ref_np, tar_np = bench_pair(shape)

    # warm-up / compile
    ref = jax.device_put(ref_np)
    tar = jax.device_put(tar_np)
    kr = sift.extract(ref)
    kt = sift.extract(tar)
    rc, tc, valid = enhanced_match(kr, kt, 0.85)
    jax.block_until_ready((rc, tc, valid))

    def run_once():
        t = {}
        ref = jax.device_put(ref_np)
        tar = jax.device_put(tar_np)
        jax.block_until_ready((ref, tar))
        plan = sift.plan(shape)

        t0 = time.perf_counter()
        gss_r, dog_r = sift._pyramids(ref, shape, plan)
        gss_t, dog_t = sift._pyramids(tar, shape, plan)
        jax.block_until_ready((gss_r, gss_t))
        t["pyramids"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        sets_r = sift._octaves(gss_r, dog_r, shape, plan)
        sets_t = sift._octaves(gss_t, dog_t, shape, plan)
        jax.block_until_ready((sets_r, sets_t))
        t["levels"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        kr = sift._finalize_jit(sets_r)
        kt = sift._finalize_jit(sets_t)
        jax.block_until_ready((kr, kt))
        t["merge"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        kr_c = compact_valid(kr)
        kt_c = compact_valid(kt)
        jax.block_until_ready((kr_c, kt_c))
        t["compact"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        res = match_descriptors(
            kr_c.desc, kt_c.desc, kr_c.valid, kt_c.valid, 0.85, mode=ENHANCED
        )
        out = match_coords(kr_c.rxyz, kt_c.rxyz, res)
        jax.block_until_ready(out)
        t["match"] = time.perf_counter() - t0
        t["total"] = sum(t.values())
        return t

    runs = [run_once() for _ in range(3)]
    best = {k: round(min(r[k] for r in runs), 4) for k in runs[0]}

    # finer: time each octave jit separately on ref volume
    plan = sift.plan(shape)
    ref = jax.device_put(ref_np)
    gss, dog = sift._pyramids(ref, shape, plan)
    jax.block_until_ready((gss, dog))
    lev = {}
    dl, gl = cfg.dog_levels, cfg.gss_levels
    for group in sift._octave_groups(plan):
        f = sift._octave_jits[(shape, group)]
        dgs = tuple(tuple(dog[o * dl: (o + 1) * dl]) for o in group)
        gss_g = tuple(tuple(gss[o * gl + 1: o * gl + dl - 1]) for o in group)
        t0 = time.perf_counter()
        out = f(dgs, gss_g)
        jax.block_until_ready(out)
        key = f"o{group[0]}" if len(group) == 1 else f"o{group[0]}-{group[-1]}"
        lev[key] = round(time.perf_counter() - t0, 4)

    if args.trace:
        with jax.profiler.trace(args.trace):
            run_once()

    print(json.dumps({"stages_s": best, "levels_s": lev, "runs": runs}, indent=1))


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent))
    main()
