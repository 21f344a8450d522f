"""Synthetic volume fixtures for tests and benchmarks.

The reference ships a Torus_Ref/Torus_Def NIfTI pair (README.md:66,
Example.cpp:10-11) that is not in the repo; these generators produce
comparable volumes: a smooth torus phantom plus a warped ("deformed") copy,
and generic smooth random fields.
"""

from __future__ import annotations

import numpy as np


def torus_volume(
    shape: tuple[int, int, int] = (64, 64, 64),
    major: float | None = None,
    minor: float | None = None,
    noise: float = 0.0,
    seed: int = 0,
) -> np.ndarray:
    """Smooth solid torus in the z=center plane, (nz, ny, nx) float32."""
    nz, ny, nx = shape
    major = major if major is not None else 0.28 * min(nx, ny)
    minor = minor if minor is not None else 0.10 * min(nx, ny)
    z = (np.arange(nz, dtype=np.float32) - (nz - 1) / 2.0)[:, None, None]
    y = (np.arange(ny, dtype=np.float32) - (ny - 1) / 2.0)[None, :, None]
    x = (np.arange(nx, dtype=np.float32) - (nx - 1) / 2.0)[None, None, :]
    ring = np.sqrt(x * x + y * y) - major
    d2 = ring * ring + z * z
    vol = np.exp(-d2 / (2.0 * (minor / 1.5) ** 2)).astype(np.float32)
    if noise > 0:
        rng = np.random.default_rng(seed)
        tex = rng.standard_normal(vol.shape).astype(np.float32)
        # Band-limit the texture (box-smooth twice): white noise would be
        # destroyed unevenly by trilinear resampling in warped variants,
        # making keypoint counts depend on the fractional shift.
        for _ in range(2):
            for ax in range(3):
                tex = (
                    tex + np.roll(tex, 1, axis=ax) + np.roll(tex, -1, axis=ax)
                ) / 3.0
        tex *= 3.0  # restore amplitude lost to smoothing
        vol = vol + noise * tex
    return vol.astype(np.float32)


def warped_volume(
    base: np.ndarray, shift: tuple[float, float, float]
) -> np.ndarray:
    """Rigidly shifted copy of `base` via trilinear resampling (edge clamp).

    shift is (sz, sy, sx): a feature at voxel p in `base` appears at p+shift.
    """
    nz, ny, nx = base.shape
    sz, sy, sx = shift
    # The shift is axis-aligned, so sample coordinates are separable:
    # broadcast 1-D index/fraction arrays instead of full 3-D meshgrids
    # (numerically identical; the dense-meshgrid fancy-indexing path was
    # pathologically slow in NumPy beyond ~128^3).
    zi = np.clip(np.arange(nz, dtype=np.float32) - sz, 0, nz - 1)[:, None, None]
    yi = np.clip(np.arange(ny, dtype=np.float32) - sy, 0, ny - 1)[None, :, None]
    xi = np.clip(np.arange(nx, dtype=np.float32) - sx, 0, nx - 1)[None, None, :]

    z0 = np.floor(zi).astype(int); z1 = np.minimum(z0 + 1, nz - 1)
    y0 = np.floor(yi).astype(int); y1 = np.minimum(y0 + 1, ny - 1)
    x0 = np.floor(xi).astype(int); x1 = np.minimum(x0 + 1, nx - 1)
    fz = zi - z0; fy = yi - y0; fx = xi - x0

    def g(a, b, c):
        return base[a, b, c]

    out = (
        g(z0, y0, x0) * (1 - fz) * (1 - fy) * (1 - fx)
        + g(z0, y0, x1) * (1 - fz) * (1 - fy) * fx
        + g(z0, y1, x0) * (1 - fz) * fy * (1 - fx)
        + g(z0, y1, x1) * (1 - fz) * fy * fx
        + g(z1, y0, x0) * fz * (1 - fy) * (1 - fx)
        + g(z1, y0, x1) * fz * (1 - fy) * fx
        + g(z1, y1, x0) * fz * fy * (1 - fx)
        + g(z1, y1, x1) * fz * fy * fx
    )
    return out.astype(np.float32)


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
    rng = np.random.default_rng(seed)
    vol = rng.standard_normal(shape).astype(np.float32)
    for _ in range(smooth):
        for ax in range(3):
            vol = (
                vol
                + np.roll(vol, 1, axis=ax)
                + np.roll(vol, -1, axis=ax)
            ) / 3.0
    return vol.astype(np.float32)
