"""Produce SCALING_r04.json: sharded-path scaling + overhead evidence.

Three sections:
  cpu_virtual_8dev : scaling.py on the 8-virtual-device CPU mesh at --size
                     (functional correctness of the shard_map Pallas path at
                     realistic shapes; throughput numbers carry no perf
                     meaning on CPU)
  tpu_mesh1        : scaling.py --pallas on the real chip's mesh(1) — the
                     sharded-path overhead vs the single-chip pipeline
  single_chip      : SIFT3D.extract_pair + enhancedMatch wall on the same
                     volumes (the non-sharded reference point)

Usage: python benchmarks/collect_scaling.py [--size 128] [--skip-cpu-mesh]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_scaling(extra, env_extra=None, timeout=3600):
    env = dict(os.environ, **(env_extra or {}))
    cmd = [sys.executable, str(REPO / "benchmarks/scaling.py")] + extra
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout,
                         env=env)
    rows = []
    for line in res.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return {"rows": rows, "rc": res.returncode,
            "stderr_tail": res.stderr.strip().splitlines()[-3:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--skip-cpu-mesh", action="store_true")
    ap.add_argument("--out", default=str(REPO / "SCALING_r04.json"))
    args = ap.parse_args()

    report = {"size": args.size}

    # single-chip reference point (real TPU)
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from sift3d_tpu import SIFT3D, SiftConfig, enhanced_match
    from sift3d_tpu.oracle import fixtures

    shape = (args.size,) * 3
    base = fixtures.torus_volume(shape, noise=0.02, seed=0)
    ref = fixtures.warped_volume(base, (0.31, 0.17, 0.23))
    tar = fixtures.warped_volume(base, (1.81, -1.83, 1.23))
    cfg = SiftConfig(max_kp_per_level=2048)
    sift = SIFT3D(cfg)

    def single_step(rv, tv):
        kr, kt = sift.extract_pair(rv, tv)
        return enhanced_match(kr, kt, 0.85)

    out = single_step(jax.device_put(ref), jax.device_put(tar))
    jax.block_until_ready(out)
    times = []
    for _ in range(args.runs):
        rv, tv = jax.device_put(ref), jax.device_put(tar)
        jax.block_until_ready((rv, tv))
        t0 = time.time()
        out = single_step(rv, tv)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    report["single_chip"] = {
        "step_s": round(float(np.median(times)), 4),
        "volumes_per_s": round(2.0 / float(np.median(times)), 3),
        "matches": int(np.asarray(out[2]).sum()),
    }

    # sharded Pallas path on the real chip's 1-device mesh: overhead measure
    report["tpu_mesh1_pallas"] = run_scaling(
        ["--size", str(args.size), "--runs", str(args.runs),
         "--kp-cap", "2048", "--pallas", "--max-devices", "1"])
    rows = report["tpu_mesh1_pallas"]["rows"]
    if rows and report["single_chip"]["step_s"]:
        report["sharded_overhead_1dev"] = round(
            rows[0]["step_s"] / report["single_chip"]["step_s"], 3)

    # functional scaling on the virtual CPU mesh at a realistic shape
    if not args.skip_cpu_mesh:
        report["cpu_virtual_8dev_pallas"] = run_scaling(
            ["--size", str(args.size), "--runs", "1", "--kp-cap", "2048",
             "--pallas", "--cpu"], timeout=7200)
        report["cpu_virtual_8dev_gspmd"] = run_scaling(
            ["--size", str(args.size), "--runs", "1", "--kp-cap", "2048",
             "--cpu"], timeout=7200)

    Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
