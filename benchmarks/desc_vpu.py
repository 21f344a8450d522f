"""Measured VPU-utilization figure for the descriptor kernel (the number
BASELINE's "descriptor-binning kernels at speed-of-light" claim rests on —
VERDICT r4 weak #7 asked for it to be auditable, not argued in prose).

Runs descriptor_bins_pallas directly: B interior keypoints of the largest
256^3 descriptor level (75^3 window), identity rotations, all subchunks
live, timed with a forced device->host fetch inside the loop (CLAUDE.md
tunnel rule). Reports:

  - measured voxels/s through the kernel (the auditable primitive),
  - sustained element-ops/s = voxels/s x ops_per_voxel, where
    ops_per_voxel is the STATIC count of vector element-ops in the traced
    per-voxel chain (counted from the jaxpr of _chain_acc on a
    representative tile — elementwise primitives weighted by output size,
    MXU dots excluded), so the figure adapts to FACE_SELECT/knob changes,
  - percent of the VPU's nominal f32 peak (8x128 lanes x 4 ALU slots x
    940 MHz = 3.85 Tops on v5e — a spec-sheet-derived nominal, recorded
    alongside rather than hidden in the ratio).

Writes the row into ROOFLINE.json under "descriptor_kernel" (preserving
the rest of the file) and prints one JSON line.
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

VPU_NOMINAL_TOPS = 3.85  # 1024 lanes x 4 slots x 0.94 GHz (v5e spec-derived)

# Elementwise jaxpr primitives counted as one VPU op per output element.
_ELEMENTWISE = {
    "add", "sub", "mul", "div", "max", "min", "abs", "neg", "exp", "sqrt",
    "rsqrt", "floor", "sign", "and", "or", "not", "xor", "select_n", "eq",
    "ne", "lt", "le", "gt", "ge", "convert_element_type", "shift_left",
    "shift_right_logical", "shift_right_arithmetic", "integer_pow",
}


def count_ops_per_voxel(rows: int, lane: int) -> float:
    """Static element-op count of the per-voxel chain, from the jaxpr of
    _chain_acc on a (rows, lane) tile. Excludes dot_general (MXU) and
    iota/broadcast bookkeeping; counts each elementwise primitive at its
    output element count / tile voxels."""
    import jax
    import jax.numpy as jnp

    from sift3d_tpu.ops.pallas.descriptor_kernel import _chain_acc

    f32 = jnp.float32
    sh = (rows, lane)

    def fn(acc, gx, gy, gz, az, ay, ax, rot):
        return _chain_acc(
            acc, gx, gy, gz, az, ay, ax,
            [rot[k] for k in range(9)],
            tuple(jnp.int32(v) for v in (37, 37, 37, 1, 74, 1, 74, 1, 74)),
            None, u=f32(1.0), r2=f32(1369.0), sigma2=f32(324.0),
            desc_hw=26.2, desc_bin_fctr=0.0763,
        )

    args = (
        jnp.zeros((16, 48), f32),
        *(jnp.zeros(sh, f32) for _ in range(3)),
        *(jnp.zeros(sh, jnp.int32) for _ in range(3)),
        jnp.zeros(9, f32),
    )
    jaxpr = jax.make_jaxpr(fn)(*args)
    total = 0

    def walk(jx):
        nonlocal total
        for eqn in jx.eqns:
            sub = []
            for v in eqn.params.values():
                vs = v if isinstance(v, (list, tuple)) else (v,)
                for b in vs:
                    inner = getattr(b, "jaxpr", None)
                    if inner is not None and hasattr(inner, "eqns"):
                        sub.append(inner)
                    elif hasattr(b, "eqns"):
                        sub.append(b)
            if sub:
                for s in sub:
                    walk(s)
                continue
            if eqn.primitive.name in _ELEMENTWISE:
                for out in eqn.outvars:
                    total += int(np.prod(out.aval.shape)) if out.aval.shape else 1

    walk(jaxpr.jaxpr)
    return total / (rows * lane)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--kps", type=int, default=32)
    ap.add_argument("--no-update", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import math

    import jax.numpy as jnp

    from sift3d_tpu.config import DESC_RAD_FCTR, DESC_SIG_FCTR, SiftConfig
    from sift3d_tpu.ops import windows as W
    from sift3d_tpu.ops.pallas import descriptor_kernel as DK
    from sift3d_tpu.pyramid import make_plan

    cfg = SiftConfig()
    plan = make_plan(cfg, (256, 256, 256))
    meta = plan.gss_meta(0, 3)  # the largest window (75^3), dominant cost
    scale32 = np.float32(meta.scale)
    sigma = float(np.float32(scale32 * np.float32(DESC_SIG_FCTR)))
    win_radius = float(np.float32(np.float32(DESC_RAD_FCTR) * np.float32(sigma)))
    desc_hw = float(np.float32(win_radius / math.sqrt(2.0)))
    desc_bin_fctr = float(np.float32(np.float32(4.0) / np.float32(2.0 * desc_hw)))
    r_vox = W.radius_voxels(win_radius, meta.unit)
    wshape = tuple(W.window_size(r_vox, n + 2) for n in meta.shape)
    Cw = int(np.prod(wshape))
    Cp = -(-Cw // DK.TILE) * DK.TILE

    rng = np.random.default_rng(0)
    B = args.kps
    win = jnp.asarray(rng.standard_normal((B, Cp)).astype(np.float32))
    maps = DK.window_offset_maps(wshape, Cp)
    if DK.SPHERE_SKIP:
        tab = jnp.asarray(DK.tile_entry_table(maps[0], maps[1]))
    else:
        tab = jnp.asarray(DK.tile_z_ranges(maps[0]))
    jzm, jym, jxm = (jnp.asarray(m) for m in maps)
    rm = (wshape[0] - 1) // 2
    c = 128  # interior center: every voxel of the cube window is in range
    kpi = jnp.asarray(
        [[c + 1 - rm, c + 1 - rm, c + 1 - rm, c, c, c, 1, 254, 1, 254, 1, 254]]
        * B, jnp.int32)
    kpok = jnp.ones(B, jnp.int32)
    rotT = jnp.asarray(np.pad(
        np.tile(np.eye(3, dtype=np.float32).reshape(1, 9), (B, 1)),
        ((0, 0), (0, 7))))
    consts = (float(meta.unit), win_radius, sigma, desc_hw, desc_bin_fctr)

    def run(w):
        return DK.descriptor_bins_pallas(
            w, jzm, jym, jxm, tab, kpi, kpok, rotT, wshape, consts)

    run_j = jax.jit(run)
    out = jax.block_until_ready(run_j(win))
    times = []
    for r in range(args.runs):
        w2 = jnp.asarray(
            (np.asarray(win) + np.float32(1e-7 * (r + 1))))  # defeat tunnel elision
        w2 = jax.device_put(w2)
        jax.block_until_ready(w2)
        t0 = time.time()
        out = run_j(w2)
        _ = float(np.asarray(out)[0, 0, 0])  # forced fetch (CLAUDE.md)
        times.append(time.time() - t0)
    dt = float(np.median(times))

    opv = count_ops_per_voxel(8, DK.LANE)
    voxels = B * Cp
    vox_s = voxels / dt
    tops = vox_s * opv / 1e12
    row = {
        "window": wshape,
        "tile": f"{DK.SUB}x{DK.LANE}",
        "face_select": DK.FACE_SELECT,
        "sphere_skip": DK.SPHERE_SKIP,
        "kps": B,
        "wall_s": round(dt, 5),
        "voxels_per_s": round(vox_s / 1e9, 3),
        "counted_ops_per_voxel": round(opv, 1),
        "sustained_tops": round(tops, 3),
        "vpu_nominal_tops": VPU_NOMINAL_TOPS,
        "pct_vpu_nominal": round(100 * tops / VPU_NOMINAL_TOPS, 1),
        "note": (
            "interior keypoints, every subchunk live; ops/voxel counted "
            "from the traced _chain_acc jaxpr (elementwise primitives x "
            "output elements, MXU dots excluded); wall includes the "
            "per-keypoint gradient pass and window HBM reads"
        ),
    }
    print(json.dumps(row))

    if not args.no_update:
        rf = REPO / "ROOFLINE.json"
        data = json.loads(rf.read_text()) if rf.exists() else {}
        data["descriptor_kernel"] = row
        rf.write_text(json.dumps(data, indent=1))


if __name__ == "__main__":
    main()
