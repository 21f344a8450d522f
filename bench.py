"""Benchmark: extract+match wall-clock on a 256^3 volume pair.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- value: steady-state wall-clock seconds for extracting keypoints from both
  volumes of a 256^3 pair and enhanced-matching them on one TPU chip
  (compile excluded; median of N runs).
- vs_baseline: speedup vs the BAR's denominator — the ACTUAL reference
  binary (unmodified sources built by tools/reference_build), measured at
  1/2/4 threads and Amdahl-modeled to 32 threads (the >=20x BASELINE bar;
  info.vs_baseline_denominator records which denominator was used). The
  independent OpenMP C++ baseline (native/cpu_baseline) and NumPy-oracle
  ratios are kept in info (vs_cpu_oracle, vs_32t_projection,
  vs_ref_binary_{4t,perfect_32t}). Cached in BENCH_CPU_CACHE.json.

Usage: python bench.py [--size 256] [--runs 5] [--skip-cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

CACHE = Path(__file__).parent / "BENCH_CPU_CACHE.json"


def bench_pair(shape):
    """The benchmark volume pair: a textured torus and a rigidly shifted
    copy, both trilinear-resampled. Cached on disk: the pure-NumPy
    trilinear resample costs ~6 min per 256^3 volume on this host."""
    from sift3d_tpu.oracle import fixtures

    cache_dir = Path(__file__).parent / ".fixture_cache"
    key = cache_dir / f"pair_{shape[0]}x{shape[1]}x{shape[2]}.npz"
    if key.exists():
        with np.load(key) as z:
            return z["ref"], z["tar"]
    base = fixtures.torus_volume(shape, noise=0.02, seed=0)
    ref = fixtures.warped_volume(base, (0.31, 0.17, 0.23))
    tar = fixtures.warped_volume(base, (1.81, -1.83, 1.23))
    cache_dir.mkdir(exist_ok=True)
    np.savez(key, ref=ref, tar=tar)
    return ref, tar


def tpu_time(size: int, runs: int, cfg=None) -> tuple[float, dict]:
    import jax

    from sift3d_tpu import SIFT3D, SiftConfig, enhanced_match
    from sift3d_tpu.oracle import fixtures

    cfg = cfg or SiftConfig()  # auto caps: full recall at any size
    shape = (size, size, size)
    # Volumes resident on device before timing: the benchmark measures
    # extract+match, not host->device transfer bandwidth. Both volumes go
    # through the same trilinear resampling (mixing a raw volume with a
    # resampled one would break descriptor matches).
    ref, tar = bench_pair(shape)
    ref = jax.device_put(ref)
    tar = jax.device_put(tar)

    sift = SIFT3D(cfg)

    def step(rv, tv):
        kr, kt = sift.extract_pair(rv, tv)
        rc, tc, valid = enhanced_match(kr, kt, 0.85)
        return (rc, tc, valid, kr.num_valid, kt.num_valid,
                kr.dropped_by_cap + kt.dropped_by_cap)

    # compile: parallel AOT warmup of the per-octave modules (overlaps XLA
    # C++ compiles across host cores + populates the persistent cache),
    # then the first full step picks everything up. compile_s is the total
    # cold-start cost (warmup + first dispatch).
    t0 = time.time()
    warmup_s = sift.warmup(shape, pair=True)
    out = step(ref, tar)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    times = []
    ref_np = np.asarray(ref)
    tar_np = np.asarray(tar)
    for _ in range(runs):
        # Fresh device buffers each run (outside the timer): the axon dev
        # tunnel elides executions whose (executable, input buffers) pair it
        # has already seen, which would undercount repeated identical runs.
        ref = jax.device_put(ref_np)
        tar = jax.device_put(tar_np)
        jax.block_until_ready((ref, tar))
        t0 = time.time()
        out = step(ref, tar)
        jax.block_until_ready(out)
        times.append(time.time() - t0)

    rc, tc, valid, n_ref, n_tar, dropped = out
    dropped = int(jax.device_get(dropped))
    info = {
        "compile_s": round(compile_s, 2),
        "warmup_s": round(warmup_s, 2),
        "ref_keypoints": int(n_ref),
        "tar_keypoints": int(n_tar),
        "matches": int(np.asarray(valid).sum()),
        "extrema_dropped_by_cap": dropped,
        "times": [round(t, 4) for t in times],
    }
    return float(np.median(times)), info


def reference_time(size: int) -> dict | None:
    """Wall-clock + per-stage timers of the ACTUAL reference binary
    (tools/reference_build/ref_driver — the unmodified MSVC sources built
    with g++/OpenMP) on the bench pair, at 1/2/4 threads.

    Returns the cache entry: per-thread-count stage timers, a per-stage
    Amdahl fit t(n) = a + b/n extrapolated to 32 threads (`modeled_32t_s`),
    and the perfect-scaling floor t(1)/32 (`perfect_32t_s`). The modeled
    number is the honest BASELINE denominator: the reference's serial
    fractions are measured, not assumed away; the perfect floor is the most
    conservative bound. Cached in BENCH_CPU_CACHE.json.
    """
    import re
    import subprocess
    import tempfile

    cache = json.loads(CACHE.read_text()) if CACHE.exists() else {}
    key = f"reference_{size}"
    if key in cache:
        return cache[key]

    driver = Path(__file__).parent / "tools/reference_build/ref_driver"
    if not driver.exists():
        build = Path(__file__).parent / "tools/reference_build/build_reference.sh"
        try:
            subprocess.run([str(build)], check=True, capture_output=True)
        except Exception:
            return None

    from sift3d_tpu.io.nifti import write_nii

    ref, tar = bench_pair((size,) * 3)
    d = tempfile.mkdtemp()
    write_nii(f"{d}/ref.nii", ref)
    write_nii(f"{d}/tar.nii", tar)

    entry = {"threads": {}}
    for t in (1, 2, 4):
        # OMP_NUM_THREADS drives the plain `#pragma omp parallel for`
        # GSS/DoG/permute loops (Src/cSIFT3D.cc:682,824,867,514) AND the
        # default of sift_thread_num (= omp_get_max_threads(), :33) that
        # the orientation/descriptor loops use; the driver's nthreads arg
        # alone would leave GSS at all cores. The matcher ignores both
        # (omp_get_num_procs(), Src/cMatcher.cc:26).
        import os as _os

        env = dict(_os.environ, OMP_NUM_THREADS=str(t))
        t0 = time.time()
        out = subprocess.run(
            [str(driver), f"{d}/ref.nii", f"{d}/tar.nii", d],
            capture_output=True, text=True, check=True, env=env,
        )
        wall = time.time() - t0
        stages: dict[str, float] = {}
        for m in re.finditer(
            r"\[(ref|tar)\] timers: alloc=([\d.]+) gss=([\d.]+) dog=([\d.]+) "
            r"detect=([\d.]+) orient=([\d.]+) desc=([\d.]+)", out.stdout
        ):
            for name, val in zip(
                ("alloc", "gss", "dog", "detect", "orient", "desc"),
                m.groups()[1:],
            ):
                stages[name] = stages.get(name, 0.0) + float(val)
        mm = re.search(r"match timers: .*total=([\d.]+)", out.stdout)
        if mm:
            stages["match"] = float(mm.group(1))
        km = re.search(r"ref_kps=(\d+) tar_kps=(\d+) matches=(\d+)", out.stdout)
        entry["threads"][str(t)] = {
            "wall_s": round(wall, 3),
            "stages": {k: round(v, 3) for k, v in stages.items()},
            "compute_s": round(sum(stages.values()), 3),
        }
        if km:
            entry["counts"] = {
                "ref_kps": int(km.group(1)), "tar_kps": int(km.group(2)),
                "matches": int(km.group(3)),
            }

    # Amdahl fit per stage on n in {1,2,4}: t(n) = a + b/n  (least squares,
    # a clamped at 0). The matcher ignores SetNumThreads (it always uses
    # omp_get_num_procs()), so scale its serial share the same way.
    modeled = 0.0
    fits = {}
    names = set()
    for v in entry["threads"].values():
        names.update(v["stages"])
    for name in sorted(names):
        ns = np.array([1.0, 2.0, 4.0])
        ts = np.array([entry["threads"][str(int(n))]["stages"].get(name, 0.0)
                       for n in ns])
        A = np.stack([np.ones_like(ns), 1.0 / ns], axis=1)
        a, b = np.linalg.lstsq(A, ts, rcond=None)[0]
        a = max(a, 0.0)
        t32 = a + b / 32.0
        fits[name] = {"serial_s": round(float(a), 3),
                      "parallel_s": round(float(b), 3),
                      "t32_s": round(float(t32), 3)}
        modeled += t32
    entry["stage_fits"] = fits
    entry["modeled_32t_s"] = round(float(modeled), 3)
    entry["perfect_32t_s"] = round(
        entry["threads"]["1"]["compute_s"] / 32.0, 3)
    cache[key] = entry
    CACHE.write_text(json.dumps(cache, indent=1))
    return entry


def cpu_oracle_time(size: int) -> float:
    """CPU baseline wall-clock for one extract+match pair at `size`^3.

    Prefers the native OpenMP C++ baseline (native/cpu_baseline, an
    independent multithreaded implementation of the same pipeline); falls
    back to the single-thread NumPy oracle measured at a feasible size and
    scaled by voxel count. Cached in BENCH_CPU_CACHE.json.
    """
    import os
    import subprocess
    import tempfile

    cache = {}
    if CACHE.exists():
        cache = json.loads(CACHE.read_text())
    key = str(size)
    if key in cache:
        return cache[key]["seconds"]

    exe = Path(__file__).parent / "native" / "cpu_baseline"
    if exe.exists():
        from sift3d_tpu.io import matrixio

        nthreads = os.cpu_count() or 4
        measure = min(size, 256)
        mkey = f"native_{measure}_{nthreads}t"
        if mkey not in cache:
            ref, tar = bench_pair((measure,) * 3)
            d = tempfile.mkdtemp()
            matrixio.write_matrix(f"{d}/ref.mat", ref)
            matrixio.write_matrix(f"{d}/tar.mat", tar)
            details = {}
            for t in sorted({1, max(nthreads // 2, 1), nthreads}):
                out = subprocess.run(
                    [str(exe), f"{d}/ref.mat", f"{d}/tar.mat", str(t)],
                    capture_output=True, text=True, check=True,
                )
                details[t] = json.loads(out.stdout)
            r = details[nthreads]
            # BASELINE's bar is vs a 32-thread CPU; this host has only
            # `nthreads` cores. Record the most conservative projection —
            # perfect linear scaling of the single-thread time to 32
            # threads (measured 1->4t scaling is ~4.1x, i.e. essentially
            # perfect, so this floor is tight; a real 32-core box would be
            # slower than this in the bandwidth-bound pyramid stage).
            proj32 = details[1]["total_s"] / 32.0
            cache[mkey] = {
                "seconds": r["total_s"],
                "detail": r,
                "thread_scaling": {
                    str(t): d["total_s"] for t, d in details.items()
                },
                "projected_32t_perfect_scaling": round(proj32, 3),
            }
            CACHE.write_text(json.dumps(cache, indent=1))
        secs = cache[mkey]["seconds"] * (size / measure) ** 3
        cache[key] = {"seconds": secs, "scaled_from": mkey}
        CACHE.write_text(json.dumps(cache, indent=1))
        return secs

    measure_size = min(size, 64)
    mkey = f"oracle_{measure_size}"
    if mkey not in cache:
        from sift3d_tpu.oracle import cpu_match, cpu_sift

        ref, tar = bench_pair((measure_size,) * 3)
        t0 = time.time()
        rr = cpu_sift.run_sift(ref)
        tt = cpu_sift.run_sift(tar)
        if rr.keypoints and tt.keypoints:
            cpu_match.match_coords(rr.keypoints, tt.keypoints, 0.85)
        cache[mkey] = {"seconds": time.time() - t0}
        CACHE.write_text(json.dumps(cache, indent=1))

    scale = (size / measure_size) ** 3
    secs = cache[mkey]["seconds"] * scale
    cache[key] = {"seconds": secs, "scaled_from": measure_size}
    CACHE.write_text(json.dumps(cache, indent=1))
    return secs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--skip-cpu", action="store_true")
    ap.add_argument(
        "--kp-cap", type=int, default=None,
        help="per-level keypoint capacity; default auto-sizes from the "
        "volume (max(4096, nvox/1024)) for full recall parity with the "
        "uncapped reference (16384 at 256^3)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sift3d_tpu import SiftConfig

    cfg = SiftConfig(max_kp_per_level=args.kp_cap)
    value, info = tpu_time(args.size, args.runs, cfg)

    # The headline vs_baseline carries the BAR's denominator: the actual
    # reference binary, Amdahl-modeled to 32 threads (>=20x bar,
    # BASELINE.md). Friendlier/stricter denominators stay in info.
    vs_baseline = None
    if not args.skip_cpu:
        cpu_s = cpu_oracle_time(args.size)
        info["vs_cpu_oracle"] = round(cpu_s / value, 2)
        info["cpu_oracle_s"] = round(cpu_s, 2)
        # honest 32-thread comparison (BASELINE's stated bar): perfect
        # linear scaling of the measured 1-thread CPU time — the most
        # conservative possible denominator (see cpu_oracle_time).
        import os

        cache = json.loads(CACHE.read_text()) if CACHE.exists() else {}
        measure = min(args.size, 256)
        entry = cache.get(f"native_{measure}_{os.cpu_count() or 4}t", {})
        p32 = entry.get("projected_32t_perfect_scaling")
        if p32:
            scaled = p32 * (args.size / measure) ** 3
            info["cpu_32t_projected_s"] = round(scaled, 3)
            info["vs_32t_projection"] = round(scaled / value, 2)

        # The actual reference binary (the true BASELINE denominator):
        # measured at 1/2/4 threads, Amdahl-modeled to 32.
        ref_entry = reference_time(min(args.size, 256))
        if ref_entry:
            s3 = (args.size / min(args.size, 256)) ** 3
            r4 = ref_entry["threads"]["4"]["compute_s"] * s3
            rm = ref_entry["modeled_32t_s"] * s3
            rp = ref_entry["perfect_32t_s"] * s3
            info["ref_binary_4t_s"] = round(r4, 3)
            info["ref_binary_modeled_32t_s"] = round(rm, 3)
            info["ref_binary_perfect_32t_s"] = round(rp, 3)
            info["vs_ref_binary_4t"] = round(r4 / value, 2)
            info["vs_ref_binary_modeled_32t"] = round(rm / value, 2)
            info["vs_ref_binary_perfect_32t"] = round(rp / value, 2)
            vs_baseline = info["vs_ref_binary_modeled_32t"]
        if vs_baseline is None:
            # no reference-binary cache for this size: fall back to the
            # independent CPU implementation ratio, clearly labeled
            info["vs_baseline_denominator"] = "cpu_oracle"
            vs_baseline = info["vs_cpu_oracle"]
        else:
            info["vs_baseline_denominator"] = "ref_binary_modeled_32t"

    print(
        json.dumps(
            {
                "metric": f"extract_match_{args.size}cubed_pair_wallclock",
                "value": round(value, 4),
                "unit": "s",
                "vs_baseline": vs_baseline,
                **{"info": info},
            }
        )
    )


if __name__ == "__main__":
    main()
