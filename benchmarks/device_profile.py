"""Device-side op-level profile of the 256^3 extract+match pair.

Captures a jax.profiler trace of one steady-state run and aggregates
device-time per HLO op category from the xplane protobuf (via xprof).
This gives the ground-truth per-kernel numbers CLAUDE.md says to use
instead of wall clock (the axon tunnel adds variable host latency).

Usage: python benchmarks/device_profile.py [--size 256] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from collections import defaultdict
from pathlib import Path


def parse_xspace(trace_dir: str):
    """Aggregate device-time (ps) per HLO op name from the xplane.pb.

    Caveat: per-op sums double-count nested events (a `while` op's duration
    includes the ops executed inside its body, async copy-starts span
    overlapping compute), so `device_total` — the honest device busy time —
    is the UNION of event intervals, not the sum of durations.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    totals = defaultdict(int)  # name -> ps
    counts = defaultdict(int)
    intervals = []
    for plane in xspace.planes:
        if "TPU" not in plane.name or "XLA" in plane.name:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; step lines duplicate
            if "xla ops" not in lname:
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                totals[meta.name] += ev.duration_ps
                counts[meta.name] += 1
                intervals.append(
                    (ev.offset_ps, ev.offset_ps + ev.duration_ps)
                )
    # busy time = union of (possibly nested/overlapping) intervals
    intervals.sort()
    device_total = 0
    cur_s = cur_e = None
    for s, e in intervals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                device_total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        device_total += cur_e - cur_s
    return totals, counts, device_total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--kp-cap", type=int, default=16384)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace-dir", default="/tmp/sift_trace")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if not args.parse_only:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            str(Path(__file__).parent.parent / ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

        from bench import bench_pair
        from sift3d_tpu import SIFT3D, SiftConfig, enhanced_match

        shape = (args.size,) * 3
        cfg = SiftConfig(max_kp_per_level=args.kp_cap)
        sift = SIFT3D(cfg)
        ref_np, tar_np = bench_pair(shape)

        def step(rv, tv):
            kr = sift.extract(rv)
            kt = sift.extract(tv)
            return enhanced_match(kr, kt, 0.85)

        import numpy as np

        ref = jax.device_put(ref_np)
        tar = jax.device_put(tar_np)
        jax.block_until_ready(step(ref, tar))  # warm

        ref = jax.device_put(ref_np)
        tar = jax.device_put(tar_np)
        jax.block_until_ready((ref, tar))
        with jax.profiler.trace(args.trace_dir):
            out = step(ref, tar)
            jax.block_until_ready(out)

    totals, counts, device_total = parse_xspace(args.trace_dir)
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]
    print(json.dumps({
        "device_total_ms": round(device_total / 1e9, 3),
        "ops": [
            {
                "name": n[:100],
                "ms": round(ps / 1e9, 3),
                "count": counts[n],
                "pct": round(100 * ps / max(device_total, 1), 1),
            }
            for n, ps in rows
        ],
    }, indent=1))


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).parent.parent))
    main()
