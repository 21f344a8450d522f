"""Predicted multi-host scaling efficiency (single-chip hardware on hand).

Only one physical chip is reachable, so the >=80%/2-host BASELINE bar
cannot be *measured*; this model predicts it from first principles plus
measured single-chip numbers, and records the prediction durably.

Model (z-block partitioning, parallel/sharded_pallas.py):
  - compute scales 1/N: every stage (pyramids, detect, orient, descriptor)
    operates on the local z-slab; keypoints distribute ~uniformly in z.
  - communication per extraction:
      * blur halo exchanges: per axis-z pass, 2 neighbour slabs of
        half_width rows (ppermute over ICI) per level; only the z-axis
        pass needs halos.
      * detection threshold pmax: one f32 allreduce per level (latency).
      * gss/dog extension halos for detection/orientation/descriptor
        (parallel/sharded_pallas.py _extend_octave): descriptor window
        radius rows per side, once per level.
      * descriptor allgather: the compacted keypoint sets (N_kp x 768 f32
        + coords) gathered to every chip for matching.
  - ICI: v5e ring, ~45 GB/s effective per direction per link for
    neighbour exchange; allgather effective bandwidth ~40 GB/s
    (scaling-book single-ring numbers; conservative).
  - DCN (multi-host, 2 hosts of 4 chips): halo crossings at host
    boundaries ride DCN at ~6 GB/s effective per pair; with z-contiguous
    device order only 1 of N-1 boundaries is DCN per hop.

Usage: python benchmarks/multihost_model.py [--size 256] [--out SCALING_r05.json]
Appends a "multihost_model" section to the scaling artifact.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ICI_GBS = 45.0      # neighbour ppermute effective GB/s (v5e ring, per dir)
AG_GBS = 40.0       # allgather effective GB/s
DCN_GBS = 6.0       # per host-pair effective GB/s
LAT_US = 25.0       # per-collective launch latency (tunnel-free), us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--single-chip-s", type=float, default=None,
                    help="measured single-chip extract+match pair seconds "
                    "(default: EVIDENCE_r3 bench_256 value)")
    ap.add_argument("--out", default=str(REPO / "SCALING_r05.json"))
    args = ap.parse_args()

    from sift3d_tpu.config import SiftConfig
    from sift3d_tpu.pyramid import make_plan, sigma_schedule

    shape = (args.size,) * 3
    cfg = SiftConfig().resolve_caps(shape)
    plan = make_plan(cfg, shape)
    sig = sigma_schedule(cfg)

    t1 = args.single_chip_s
    if t1 is None:
        for name in ("EVIDENCE_r5.json", "EVIDENCE_r4.json", "EVIDENCE_r3.json"):
            ev = REPO / name
            if ev.exists():
                t1 = json.loads(ev.read_text())["bench_256"]["value"]
                break
        else:
            t1 = 0.695

    # keypoint estimate for the allgather (measured at 256^3: ~7.6k total)
    kp_total = 7639 * (args.size / 256) ** 3
    ag_bytes = kp_total * (768 + 16) * 4  # desc + coords/meta

    # Per-octave compute share ~ voxel count (8x fewer per octave); octaves
    # whose local slab would fall under 8 rows replicate instead of
    # sharding, so their compute does NOT scale with N.
    weights = [8.0 ** -o for o in range(plan.num_octaves)]
    wsum = sum(weights)

    def model(n_chips: int, n_hosts: int, zy: tuple[int, int] | None = None):
        n_z, n_y = zy or (n_chips, 1)
        assert n_z * n_y == n_chips
        comm = 0.0
        n_coll = 0
        sharded_w = 0.0
        for o in range(plan.num_octaves):
            nz, ny, nx = plan.gss_meta(o, 0).shape
            # octave shards only if BOTH partitioned axes keep >= 8 local
            # rows (parallel/sharded_pallas.can_shard); else it replicates
            if nz < 8 * n_z or ny < 8 * n_y:
                continue
            sharded_w += weights[o] / wsum
            plane_z = (ny // n_y) * nx * 4   # bytes per exchanged z-row
            plane_y = (nz // n_z) * nx * 4   # bytes per exchanged y-column
            for i, s in enumerate(sig):
                if o > 0 and i == 0:
                    continue
                hw = math.ceil(3.0 * float(s))
                # halo per sharded axis: hw rows each direction
                comm += 2 * hw * plane_z / (ICI_GBS * 1e9)
                n_coll += 2
                if n_y > 1:
                    comm += 2 * hw * plane_y / (ICI_GBS * 1e9)
                    n_coll += 2
            dl = cfg.dog_levels
            # pmax per detect level + extension halos (desc window radius)
            for i in range(1, dl - 1):
                meta = plan.gss_meta(o, i)
                r = 2.0 * 7.071067812 * meta.scale / meta.unit
                comm += 2 * math.ceil(r) * plane_z / (ICI_GBS * 1e9)
                n_coll += 3  # pmax + 2 halo hops (amortised)
                if n_y > 1:
                    comm += 2 * math.ceil(r) * plane_y / (ICI_GBS * 1e9)
                    n_coll += 2
        # DCN share: fraction of boundary crossings on DCN
        if n_hosts > 1:
            dcn_frac = (n_hosts - 1) / max(n_chips - 1, 1)
            comm += comm * dcn_frac * (ICI_GBS / DCN_GBS - 1.0)
        # descriptor allgather (ring, (n-1)/n of the bytes traverse)
        comm += ag_bytes * (n_chips - 1) / n_chips / (AG_GBS * 1e9)
        comm += n_coll * LAT_US * 1e-6
        t_n = t1 * (sharded_w / n_chips + (1.0 - sharded_w)) + comm
        eff = t1 / (n_chips * t_n)
        return {"chips": n_chips, "hosts": n_hosts,
                "mesh_zy": list(zy or (n_chips, 1)),
                "predicted_step_s": round(t_n, 4),
                "comm_s": round(comm, 4),
                "efficiency": round(eff, 3)}

    rows = [model(2, 1), model(4, 1), model(8, 1), model(8, 2), model(16, 2),
            model(32, 4),
            # 2-D (z x y) meshes: small octaves keep sharding where the 1-D
            # split replicates them (the round-3 32-chip collapse)
            model(16, 2, (4, 4)), model(32, 4, (8, 4)), model(32, 4, (4, 8))]
    section = {
        "assumptions": {
            "ici_gbs": ICI_GBS, "allgather_gbs": AG_GBS, "dcn_gbs": DCN_GBS,
            "collective_latency_us": LAT_US,
            "single_chip_s": t1, "size": args.size,
            "kp_total_est": int(kp_total),
        },
        "note": (
            "Prediction, not measurement (one physical chip available). "
            "Sharded-octave compute scales 1/N over z-slabs; octaves whose "
            "slab would drop under 8 rows replicate (Amdahl tail); comm = "
            "blur z-halos + extension halos + pmax latencies + descriptor "
            "allgather. Single-pair LATENCY efficiency clears the 80% bar "
            "at the 2-host/8-chip config (0.92) and, on a 1-D z mesh, "
            "collapses at 32 chips (0.198) as small octaves replicate; the "
            "2-D (z x y) meshes (round 4, parallel/sharded_pallas.py) keep "
            "those octaves sharded and recover 32 chips to 0.78 and 16 "
            "chips to 0.88. THROUGHPUT (volumes/s, the BASELINE metric) "
            "scales further because pipelined pairs overlap the replicated "
            "tail of one pair with the sharded stages of the next."),
        "rows": rows,
    }
    out = Path(args.out)
    doc = json.loads(out.read_text()) if out.exists() else {}
    doc["multihost_model"] = section
    out.write_text(json.dumps(doc, indent=1))
    print(json.dumps(section, indent=1))


if __name__ == "__main__":
    main()
