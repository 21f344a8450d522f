"""On-TPU parity check of the fused detect kernel at sublane-unaligned ny
(advisor r4 low: every committed real-TPU parity shape had ny % 8 == 0 at
all octaves, so the pltpu.roll y-neighbour path was unexercised on hardware
for unaligned planes, where physical padding semantics could differ from
interpret mode).

Compares detect_level_pallas against the XLA extrema_mask + compact path on
edge shapes including ny % 8 != 0 and asserts identical index sets, counts
and thresholds. Prints one JSON line; exit 1 on mismatch.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

    from sift3d_tpu.ops import detect as D
    from sift3d_tpu.ops.pallas.detect_kernel import detect_level_pallas

    assert jax.default_backend() == "tpu", "run with the axon tunnel up"

    rng = np.random.default_rng(0)
    results = []
    ok_all = True
    for shape in [(12, 40, 20), (9, 9, 9), (16, 21, 33), (10, 12, 130)]:
        prev = rng.standard_normal(shape).astype(np.float32)
        cur = rng.standard_normal(shape).astype(np.float32)
        nxt = rng.standard_normal(shape).astype(np.float32)
        cap = 512
        pt = 0.1

        idx, count, thres = jax.jit(
            detect_level_pallas, static_argnames=("peak_thresh", "cap")
        )(jnp.asarray(prev), jnp.asarray(cur), jnp.asarray(nxt), pt, cap)
        got = D.decode_indices(idx, count, thres, shape)

        mask, thres_x = D.extrema_mask(
            jnp.asarray(prev), jnp.asarray(cur), jnp.asarray(nxt), pt)
        want = D.compact(mask, cap, thres_x, use_pallas=False)

        def keyset(d):
            v = np.asarray(d.valid)
            return {
                (int(z), int(y), int(x))
                for z, y, x in zip(
                    np.asarray(d.z)[v], np.asarray(d.y)[v], np.asarray(d.x)[v])
            }

        g, w = keyset(got), keyset(want)
        same = (
            g == w
            and int(got.count) == int(want.count)
            and float(np.asarray(got.threshold))
            == float(np.asarray(want.threshold))
        )
        ok_all &= same
        results.append({
            "shape": shape, "ny_mod_8": shape[1] % 8,
            "count": int(want.count), "sets_equal": bool(same),
        })

    print(json.dumps({"backend": "tpu", "cases": results, "ok": ok_all}))
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
