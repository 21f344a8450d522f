"""Large-keypoint-set matcher benchmark (BASELINE config 3).

bijectMatch + enhancedMatch over >50k-keypoint sets with a ratio-threshold
sweep 0.7-0.9, using the row-chunked top-2 matmul matcher (the score matrix
never materialises in full). Prints one JSON line per configuration.

Usage: python benchmarks/match_scale.py [--n 50000] [--m 50000] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _base(n, rng):
    d = rng.random((n, 768), dtype=np.float32)
    d[d < 0.85] = 0.0
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
    return d


def synth_pair(n, m, rng, frac=0.24):
    """(ref, tar) unit-norm sparse descriptor sets with a GRADED planted
    structure so the ratio-threshold sweep discriminates (VERDICT r3 #7):
    for k = frac*min(n,m)/2 ref descriptors, tar gets TWO noisy copies with
    noise amplitudes e1 = e2*sqrt(rho_i), rho_i in [0.40, 0.97]. For unit
    vectors d = 2-2*dot ~ e^2, so the planted top-2 ratio d1/d2 ~ rho_i:
    the filter accepts iff d1/d2 < t^2 (Src/cMatcher.cc:81-97), giving
    match counts that rise monotonically across the 0.7-0.9 sweep instead
    of the round-3 fixture's all-or-nothing 15000."""
    ref = _base(n, rng)
    tar = _base(m, rng)
    k = int(frac * min(n, m) / 2)
    gi = rng.choice(n, k, replace=False)
    slots = rng.choice(m, 2 * k, replace=False)
    rho = np.linspace(0.40, 0.97, k, dtype=np.float32)
    e2 = np.float32(0.22)
    e1 = e2 * np.sqrt(rho)

    def noisy(base_rows, amp):
        u = rng.standard_normal(base_rows.shape).astype(np.float32)
        u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-12
        out = base_rows + amp[:, None] * u
        return out / (np.linalg.norm(out, axis=1, keepdims=True) + 1e-12)

    tar[slots[:k]] = noisy(ref[gi], e1)
    tar[slots[k:]] = noisy(ref[gi], np.full(k, e2, np.float32))
    return ref, tar


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50000)
    ap.add_argument("--m", type=int, default=50000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--row-chunk", type=int, default=2048)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from sift3d_tpu.ops import match as M

    rng = np.random.default_rng(0)
    ref, tar = synth_pair(args.n, args.m, rng)
    ref_d = jax.device_put(ref)
    tar_d = jax.device_put(tar)
    rv = jnp.ones(args.n, bool)
    tv = jnp.ones(args.m, bool)

    for mode, name in [(M.BIJECT, "biject"), (M.ENHANCED, "enhanced")]:
        fn = jax.jit(
            lambda r, t: M.match_descriptors(
                r, t, rv, tv, 0.85, mode=mode, row_chunk=args.row_chunk
            ),
            static_argnames=(),
        )
        out = jax.block_until_ready(fn(ref_d, tar_d))
        times = []
        for _ in range(args.runs):
            r2 = jax.device_put(ref)  # fresh buffers (axon caching)
            t2 = jax.device_put(tar)
            jax.block_until_ready((r2, t2))
            t0 = time.time()
            out = jax.block_until_ready(fn(r2, t2))
            times.append(time.time() - t0)
        dt = float(np.median(times))
        gflop = 2 * args.n * args.m * 768 * 2 / 1e9  # fwd + rev
        print(json.dumps({
            "mode": name, "n": args.n, "m": args.m,
            "seconds": round(dt, 4),
            "matches": int(np.asarray(out.valid).sum()),
            "tflops": round(gflop / dt / 1e3, 2),
        }), flush=True)

    # threshold sweeps reusing one top-2 pass per direction, for BOTH
    # first-class reference modes (bijectMatch Src/cMatcher.cc:219-224,
    # enhancedMatch :226-228 — BASELINE config 3 names both at >50k;
    # VERDICT r4 missing #3 asked for durable biject rows).
    thresholds = jnp.asarray(np.linspace(0.7, 0.9, 9), jnp.float32)
    for mode, name in [(M.BIJECT, "biject"), (M.ENHANCED, "enhanced")]:
        sweep = jax.jit(
            lambda r, t, _m=mode: M.threshold_sweep(
                r, t, rv, tv, thresholds, mode=_m)
        )
        masks = jax.block_until_ready(sweep(ref_d, tar_d))
        r2 = jax.device_put(ref); t2 = jax.device_put(tar)
        jax.block_until_ready((r2, t2))
        t0 = time.time()
        masks = jax.block_until_ready(sweep(r2, t2))
        dt = time.time() - t0
        counts = np.asarray(masks).sum(axis=1).tolist()
        # sweep-vs-per-threshold equality at full scale (VERDICT r1 item
        # 9): the sweep reuses one top-2 pass per direction; verify it
        # reproduces the independent per-threshold matcher exactly for a
        # mid threshold.
        chk = M.match_descriptors(ref_d, tar_d, rv, tv, 0.8, mode=mode)
        k8 = int(np.argmin(np.abs(np.linspace(0.7, 0.9, 9) - 0.8)))
        sweep_eq = bool(
            np.array_equal(np.asarray(masks)[k8], np.asarray(chk.valid))
        )
        print(json.dumps({
            "mode": f"{name}_sweep_0.7-0.9", "n": args.n, "m": args.m,
            "seconds": round(dt, 4),
            "matches_per_threshold": counts,
            "sweep_equals_per_threshold_at_0.8": sweep_eq,
        }), flush=True)


if __name__ == "__main__":
    main()
