"""Matcher score-precision A/B (DESIGN.md roadmap item 2).

f32 HIGHEST einsum on TPU runs 6 bf16 MXU passes; HIGH runs 3. The match
scores are dots of unit vectors compared against a ratio threshold, so
reduced passes may flip borderline matches. This measures both settings on
realistic descriptor sets and reports whether the match sets are identical
— the gate for flipping the default (ops/match.py SCORE_PRECISION).

Usage: python benchmarks/match_precision.py [--n 20000] [--m 20000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--m", type=int, default=20000)
    ap.add_argument("--threshold", type=float, default=0.85)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke test)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from sift3d_tpu.ops import match as M

    rng = np.random.default_rng(0)

    def descs(n, seed):
        r = np.random.default_rng(seed)
        base = r.standard_normal((n, 768)).astype(np.float32)
        base = np.abs(base)  # descriptors are non-negative
        return base / np.linalg.norm(base, axis=1, keepdims=True)

    ref = descs(args.n, 1)
    tar = descs(args.m, 2)
    # make half the targets near-duplicates of refs so the ratio test has
    # realistic borderline cases
    k = min(args.n, args.m) // 2
    tar[:k] = ref[:k] + 0.05 * np.abs(rng.standard_normal((k, 768))).astype(np.float32)
    tar /= np.linalg.norm(tar, axis=1, keepdims=True)

    rv = jnp.ones(args.n, bool)
    tv = jnp.ones(args.m, bool)
    ref_j = jnp.asarray(ref)
    tar_j = jnp.asarray(tar)

    out = {}
    results = {}
    for name, prec in (
        ("HIGHEST", jax.lax.Precision.HIGHEST),
        ("HIGH", jax.lax.Precision.HIGH),
    ):
        res = M.match_descriptors(ref_j, tar_j, rv, tv, args.threshold,
                                  mode=M.ENHANCED, precision=prec)
        jax.block_until_ready(res)
        results[name] = (np.asarray(res.tar_idx), np.asarray(res.valid))
        times = []
        for i in range(args.runs):
            # content-varying inputs each run: the axon tunnel elides
            # executions whose input CONTENT it has already seen, so
            # repeating identical buffers undercounts. Rolling rows only
            # permutes indices (identical workload).
            r2 = jnp.asarray(np.roll(ref, i + 1, axis=0))
            t2 = jnp.asarray(np.roll(tar, i + 1, axis=0))
            jax.block_until_ready((r2, t2))
            t0 = time.time()
            tres = M.match_descriptors(r2, t2, rv, tv, args.threshold,
                                       mode=M.ENHANCED, precision=prec)
            jax.block_until_ready(tres)
            times.append(time.time() - t0)
        out[name] = {
            "seconds": round(float(np.median(times)), 4),
            "matches": int(results[name][1].sum()),
        }
    same_valid = bool(np.array_equal(results["HIGHEST"][1], results["HIGH"][1]))
    same_idx = bool(
        np.array_equal(
            results["HIGHEST"][0][results["HIGHEST"][1]],
            results["HIGH"][0][results["HIGH"][1]],
        )
        if same_valid else False
    )
    out["match_sets_identical"] = same_valid and same_idx
    out["speedup_high_vs_highest"] = round(
        out["HIGHEST"]["seconds"] / max(out["HIGH"]["seconds"], 1e-9), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
