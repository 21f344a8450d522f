"""Scaling-efficiency harness: volumes/s at 1 chip vs N devices.

BASELINE asks for volumes/s scaling efficiency at 1 chip, 1 host, N hosts.
This harness measures the sharded extract+match step over meshes of
increasing size using whatever devices the runtime exposes — real TPU chips
when available, or the virtual CPU mesh (functional numbers only; set
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu).

Usage: python benchmarks/scaling.py [--size 128] [--runs 3] [--max-devices 8]
Prints one JSON line per mesh size with volumes/s and efficiency vs 1 device.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--max-devices", type=int, default=None)
    ap.add_argument("--kp-cap", type=int, default=2048)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend with 8 virtual devices "
                    "(functional scaling only; no perf meaning)")
    ap.add_argument("--pallas", action="store_true",
                    help="use the shard_map per-chip Pallas step "
                    "(parallel/sharded_pallas.py) instead of the GSPMD "
                    "step — the fast path on real TPU meshes")
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sift3d_tpu.config import SiftConfig
    from sift3d_tpu.oracle import fixtures
    from sift3d_tpu.parallel import mesh as M

    if args.pallas:
        from sift3d_tpu.parallel.sharded_pallas import (
            make_sharded_pallas_step as make_sharded_step,
        )
    else:
        from sift3d_tpu.parallel.sharded import make_sharded_step

    ndev_avail = len(jax.devices())
    limit = args.max_devices or ndev_avail
    shape = (args.size,) * 3
    cfg = SiftConfig(max_kp_per_level=args.kp_cap)

    base = fixtures.torus_volume(shape, noise=0.02, seed=0)
    ref = fixtures.warped_volume(base, (0.31, 0.17, 0.23))
    tar = fixtures.warped_volume(base, (1.81, -1.83, 1.23))

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= min(limit, ndev_avail)]
    base_rate = None
    for n in sizes:
        mesh = M.make_mesh(n)
        step, sharding = make_sharded_step(mesh, shape, cfg)
        rv = jax.device_put(ref, sharding)
        tv = jax.device_put(tar, sharding)
        out = step(rv, tv)
        jax.block_until_ready(out)  # compile
        # throwaway timed-shape run: the FIRST post-warmup step through the
        # tunnel completes anomalously fast (elided; measured 4-8 ms vs
        # the real ~78 ms at 128^3 mesh(1)) — burn one run of the same
        # form as the measured ones before timing
        rv = jax.device_put(ref + np.float32(0.3), sharding)
        tv = jax.device_put(tar + np.float32(0.3), sharding)
        jax.block_until_ready(step(rv, tv))
        times = []
        for r in range(args.runs):
            # content-varying buffers each run: the axon dev tunnel elides
            # executions it has already seen, and fresh device_put of
            # IDENTICAL content can still be recognised — perturb by an
            # amplitude far below any detection threshold so every run
            # really executes (same trick as benchmarks/match_precision.py).
            # LARGE, well-separated per-run amplitudes: the staged
            # sharded path is elided by the tunnel for near-identical
            # content even when f32 bits differ (measured r4: 3.6 ms
            # "steps" vs the real ~78 ms at 128^3 mesh(1); the single-chip
            # jit path is NOT elided). Match counts vary by +-1 across
            # runs as a result (timing-only harness — correctness is
            # tests/test_sharded.py's job).
            eps = np.float32(0.39 + 0.09 * r + np.random.random() * 0.01)
            rv = jax.device_put(ref + eps, sharding)
            tv = jax.device_put(tar + eps, sharding)
            jax.block_until_ready((rv, tv))
            t0 = time.time()
            out = step(rv, tv)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
            # force a real device->host fetch between runs: on the tunnel,
            # back-to-back block_until_ready-only runs read anomalously
            # fast (4 ms vs the real 78 ms at 128^3), while interleaved
            # fetches reproduce the physically-consistent number
            _ = int(np.asarray(out["match_valid"]).sum())
        dt = float(np.median(times))
        rate = 2.0 / dt  # two volumes per step
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        print(json.dumps({
            "devices": n,
            "volumes_per_s": round(rate, 3),
            "step_s": round(dt, 4),
            "efficiency_vs_1dev": round(eff, 3),
            "matches": int(np.asarray(out["match_valid"]).sum()),
        }), flush=True)


if __name__ == "__main__":
    main()
