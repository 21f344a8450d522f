"""Synthetic volume fixtures for tests and benchmarks.

The reference ships a Torus_Ref/Torus_Def NIfTI pair (README.md:66,
Example.cpp:10-11) that is not in the repo; these generators produce
comparable volumes: a smooth torus phantom plus a warped ("deformed") copy,
and generic smooth random fields.

All generation runs through XLA on the host CPU (eager jax ops pinned to
the cpu device, returned as NumPy arrays). This VM's NumPy SIMD kernels
degrade episodically by ~100-200x (exp, the ziggurat sampler, even plain
broadcast adds during bad phases) — 512^3 generation took over an hour on
NumPy; XLA's own kernels are unaffected. Generation is deterministic in
`seed` (threefry) but the values differ from the pre-round-2 NumPy
implementation; cached .fixture_cache pairs are unaffected.
"""

from __future__ import annotations

import numpy as np


def _cpu():
    import jax

    # local_devices, not devices: under jax.distributed, devices() is the
    # global list and another process's device is not addressable here.
    return jax.local_devices(backend="cpu")[0]


def torus_volume(
    shape: tuple[int, int, int] = (64, 64, 64),
    major: float | None = None,
    minor: float | None = None,
    noise: float = 0.0,
    seed: int = 0,
) -> np.ndarray:
    """Smooth solid torus in the z=center plane, (nz, ny, nz) float32."""
    import jax
    import jax.numpy as jnp
    from jax import random as jr

    nz, ny, nx = shape
    major = major if major is not None else 0.28 * min(nx, ny)
    minor = minor if minor is not None else 0.10 * min(nx, ny)
    with jax.default_device(_cpu()):
        z = (jnp.arange(nz, dtype=jnp.float32) - (nz - 1) / 2.0)[:, None, None]
        y = (jnp.arange(ny, dtype=jnp.float32) - (ny - 1) / 2.0)[None, :, None]
        x = (jnp.arange(nx, dtype=jnp.float32) - (nx - 1) / 2.0)[None, None, :]
        ring = jnp.sqrt(x * x + y * y) - jnp.float32(major)
        d2 = ring * ring + z * z
        # flush the far-field tail to exact zero: f32 denormals make every
        # later CPU pass over the volume crawl (x86 microcoded denormals)
        arg = -d2 / jnp.float32(2.0 * (minor / 1.5) ** 2)
        vol = jnp.where(
            arg > -80.0, jnp.exp(jnp.maximum(arg, -80.0)), 0.0
        ).astype(jnp.float32)
        if noise > 0:
            tex = jr.normal(jr.PRNGKey(seed), shape, dtype=jnp.float32)
            # Band-limit the texture (box-smooth twice): white noise would
            # be destroyed unevenly by trilinear resampling in warped
            # variants, making keypoint counts depend on the fractional
            # shift.
            for _ in range(2):
                for ax in range(3):
                    tex = (
                        tex
                        + jnp.roll(tex, 1, axis=ax)
                        + jnp.roll(tex, -1, axis=ax)
                    ) / 3.0
            tex = tex * 3.0  # restore amplitude lost to smoothing
            vol = vol + jnp.float32(noise) * tex
        return np.asarray(vol, dtype=np.float32)


def warped_volume(
    base: np.ndarray, shift: tuple[float, float, float]
) -> np.ndarray:
    """Rigidly shifted copy of `base` via trilinear resampling (edge clamp).

    shift is (sz, sy, sx): a feature at voxel p in `base` appears at p+shift.
    """
    import jax
    import jax.numpy as jnp

    import math

    nz, ny, nx = base.shape

    def expand(v, axis):
        sh = [1, 1, 1]
        sh[axis] = v.shape[0]
        return v.reshape(sh)

    def axis_lerp(b, axis, s, n):
        # Sample coordinates i - s (edge-clamped) have one constant
        # fractional part, so the clamped floor/ceil gathers are just
        # edge-padded SLICES — XLA gathers crawl on this host.
        ci = jnp.clip(jnp.arange(n, dtype=jnp.float32) - jnp.float32(s),
                      0, n - 1)
        c0 = jnp.floor(ci)
        f = expand(ci - c0, axis)
        k0 = math.floor(-s)
        m = abs(k0) + 2
        pads = [(0, 0)] * 3
        pads[axis] = (m, m)
        bp = jnp.pad(b, pads, mode="edge")

        def sl(off):
            idx = [slice(None)] * 3
            idx[axis] = slice(m + off, m + off + n)
            return bp[tuple(idx)]

        # interior rows use slices at k0/k0+1; clamped edge rows coincide
        # with the edge-replicated padding, and their f values already
        # account for the clamp.
        return sl(k0) * (1 - f) + sl(k0 + 1) * f

    with jax.default_device(_cpu()):
        out = jnp.asarray(base)
        for axis, s, n in ((0, shift[0], nz), (1, shift[1], ny),
                           (2, shift[2], nx)):
            out = axis_lerp(out, axis, s, n)
        return np.asarray(out, dtype=np.float32)


def warped_torus(
    shape: tuple[int, int, int] = (64, 64, 64),
    shift: tuple[float, float, float] = (1.5, -2.0, 1.0),
    seed: int = 1,
    noise: float = 0.02,
) -> np.ndarray:
    """Rigidly shifted textured torus as the 'deformed' benchmark target.

    Textured with the same noise field as torus_volume(seed=0) *before*
    warping, so ref/tar keypoints genuinely correspond — a noise-free torus
    is rotationally ambiguous and the orientation corner filter (correctly)
    rejects nearly everything on it.
    """
    return warped_volume(torus_volume(shape, noise=noise, seed=0), shift)


def smooth_random_volume(
    shape: tuple[int, int, int] = (48, 48, 48), seed: int = 0, smooth: int = 3
) -> np.ndarray:
    """Band-limited random field: white noise box-filtered `smooth` times."""
    import jax
    import jax.numpy as jnp
    from jax import random as jr

    with jax.default_device(_cpu()):
        vol = jr.normal(jr.PRNGKey(seed), shape, dtype=jnp.float32)
        for _ in range(smooth):
            for ax in range(3):
                vol = (
                    vol
                    + jnp.roll(vol, 1, axis=ax)
                    + jnp.roll(vol, -1, axis=ax)
                ) / 3.0
        return np.asarray(vol, dtype=np.float32)
