"""Empirical Mosaic DMA slice-legality probe (round-4 gather verdict).

Round 3 recorded one rejection ("Slice shape along dimension 1 must be
aligned to tiling (8), but is 21") for the HBM->HBM window-gather DMA
(ops/pallas/gather_kernel.py, kept disabled). This probe pins down the
full acceptance matrix on hardware, because the viability of every
gather-kernel design hinges on it:

    shape (77,77,77)  any offsets      -> REJECT (odd y and x extents)
    shape (77,80,77)  any offsets      -> REJECT (x extent 77)
    shape (77,80,128) any offsets      -> REJECT (unaligned y/x offsets)
    shape (77,80,77)  y-offset 8-align -> REJECT (x extent 77)
    shape (77,80,128) offsets (any, 8k, 128k) -> OK, bit-exact

Conclusion: `make_async_copy` needs FULLY tile-aligned offsets AND
extents in the two minor dims. Covering an arbitrary-phase window from
aligned starts multiplies traffic 3.8-6.3x (e.g. (77,88,256) for a 77^3
window), which cancels the DMA's bandwidth advantage over the XLA DUS
gather — hence the per-keypoint DUS stays (DESIGN.md round-4 candidate 1).

Usage: python benchmarks/dma_probe.py [--out DMA_PROBE_r05.json]
(needs a real TPU; prints one OK/FAIL line per case and, with --out,
writes the acceptance matrix as a JSON artifact for the evidence suite —
VERDICT r4 #8 asks for the re-probe result to be recorded either way)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="write the acceptance matrix JSON here")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make(wshape, align_y=1, align_x=1):
        Wz, Wy, Wx = wshape

        def _kernel(sz_ref, sy_ref, sx_ref, vol_ref, out_ref, sem):
            b = pl.program_id(0)
            sy = sy_ref[b]
            sx = sx_ref[b]
            if align_y > 1:
                sy = pl.multiple_of(sy, align_y)
            if align_x > 1:
                sx = pl.multiple_of(sx, align_x)
            src = vol_ref.at[
                pl.ds(sz_ref[b], Wz), pl.ds(sy, Wy), pl.ds(sx, Wx)
            ]
            pltpu.make_async_copy(src, out_ref.at[b], sem).start()
            pltpu.make_async_copy(src, out_ref.at[b], sem).wait()

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3, grid=(8,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA])

        def run(vol, sz, sy, sx):
            return pl.pallas_call(
                _kernel, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((8,) + wshape, jnp.float32),
            )(sz, sy, sx, vol)

        return run

    vol = jnp.asarray(
        np.random.default_rng(0).standard_normal((258, 258, 258)), jnp.float32)
    rng = np.random.default_rng(1)
    cases = [
        ((77, 77, 77), 1, 1, "odd y extent, odd x extent"),
        ((77, 80, 77), 1, 1, "y extent 80, x extent 77, unaligned offsets"),
        ((77, 80, 128), 1, 1, "y ext 80, x ext 128, unaligned offsets"),
        ((77, 80, 77), 8, 1, "y ext 80 y-off 8-aligned, x ext 77"),
        ((77, 80, 128), 8, 128, "fully aligned offsets+extents"),
    ]
    rows = []
    for wshape, ay, ax, note in cases:
        Wz, Wy, Wx = wshape
        sz = jnp.asarray(rng.integers(0, 258 - Wz, 8), jnp.int32)
        sy = jnp.asarray(rng.integers(0, (258 - Wy) // ay, 8) * ay, jnp.int32)
        sx = jnp.asarray(rng.integers(0, (258 - Wx) // ax, 8) * ax, jnp.int32)
        try:
            out = np.asarray(make(wshape, ay, ax)(vol, sz, sy, sx))
            ref = np.stack([
                np.asarray(vol)[sz[b]:sz[b] + Wz, sy[b]:sy[b] + Wy,
                                sx[b]:sx[b] + Wx]
                for b in range(8)
            ])
            md = float(np.abs(out - ref).max())
            print(f"OK   {note}: maxdiff={md}")
            rows.append({"shape": list(wshape), "align_y": ay, "align_x": ax,
                         "case": note, "accepted": True, "maxdiff": md})
        except Exception as e:  # Mosaic lowering rejection
            msg = str(e).splitlines()[0][:160]
            print(f"FAIL {note}: {msg}")
            rows.append({"shape": list(wshape), "align_y": ay, "align_x": ax,
                         "case": note, "accepted": False, "error": msg})
    import jaxlib

    result = {
        "metric": "mosaic_dma_slice_acceptance",
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "cases": rows,
        "verdict": (
            "unchanged — only fully tile-aligned offsets AND extents "
            "accepted; per-keypoint DUS gather stands"
            if [r["accepted"] for r in rows] == [False] * 4 + [True]
            else "CHANGED vs round 4 — revisit gather_kernel.py"
        ),
    }
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
