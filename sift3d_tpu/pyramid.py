"""Scale-space pyramid metadata and Gaussian smoothing operators.

TPU-first design: the reference implements the separable 3-D Gaussian blur as
a scalar tap loop with a two-pass interior/boundary scheme and axis permutes
(`Src/cSIFT3D.cc:535-847`). On TPU we instead encode each 1-D axis pass —
including the reference's exact boundary behaviour (mirroring with the
``conv_eps = 0.1`` offset, the blended tap at ``coords == dim_end``, and the
interior/boundary row split) — into the rows of a static ``(n, n)`` float32
*smoothing matrix* built once at trace time. The whole separable blur is then
three einsum contractions that run on the MXU with no permutes and no
boundary special-casing on device.

Numerical parity notes (vs `GaussianSmooth_3D_Imp`, Src/cSIFT3D.cc:624-790):
- interior rows (hw <= x <= n-hw-2): plain band of kernel taps; the
  reference's linear-interp formulation is a no-op there because
  ``unit_factor == 1`` makes every tap coordinate integral (frac == 0).
- boundary rows: taps with coordinate c < 0 mirror to -c (exact, frac == 0);
  taps with c >= n-1 map to 2*(n-1) - c - 0.1 and are *linearly interpolated*
  between the two neighbouring voxels (the 0.1 offset means even the tap at
  exactly c == n-1 becomes a 0.1/0.9 blend of voxels n-2 and n-1).
- out-of-range mirrors (possible only when half_width >= n-1, i.e. the very
  smallest octave with the widest kernels) read out-of-bounds memory in the
  reference; we clamp the index into range instead. Documented deviation.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from .config import DBL_EPSILON, CONV_EPS, SiftConfig


# ---------------------------------------------------------------------------
# Sigma schedule
# ---------------------------------------------------------------------------

def sigma_schedule(cfg: SiftConfig) -> np.ndarray:
    """Incremental blur widths per GSS level (Src/cSIFT3D.cc:272-287).

    sigmas[0] = sigma0 = sigma_default * 2^(-1/3)
    sigmas[i] = sqrt((k^i sigma0)^2 - (k^(i-1) sigma0)^2),  k = 2^(1/levels)
    """
    n = cfg.gss_levels
    sigmas = np.zeros(n, dtype=np.float32)
    k = np.float32(2.0 ** (1.0 / cfg.num_kp_levels))
    base = np.float32(cfg.sigma0())
    sigmas[0] = base
    for i in range(1, n):
        sig_prev = np.float32(np.float64(k) ** (i - 1) * np.float64(base))
        sig_total = np.float32(sig_prev * k)
        sigmas[i] = np.float32(math.sqrt(float(sig_total) ** 2 - float(sig_prev) ** 2))
    return sigmas


def base_sigma(cfg: SiftConfig) -> float:
    """Blur applied to the raw volume at (octave 0, level 0):
    sqrt(sigmas[0]^2 - sigma_n^2) (Src/cSIFT3D.cc:299)."""
    s0 = float(sigma_schedule(cfg)[0])
    return math.sqrt(s0 * s0 - cfg.sigma_n_default ** 2)


def gaussian_kernel(sigma: float) -> np.ndarray:
    """Normalised 1-D Gaussian taps (Src/cSIFT3D.cc:541-572).

    half_width = max(ceil(3*sigma), 1); kernel[i] = exp(-0.5*((i-hw)/sigma)^2)
    normalised to unit sum, computed with the reference's float32 arithmetic.
    """
    sigma = max(float(sigma), 0.0)
    half_width = max(int(math.ceil(sigma * 3.0)), 1) if sigma > 0 else 1
    width = 2 * half_width + 1
    kernel = np.zeros(width, dtype=np.float32)
    acc = np.float32(0.0)
    for i in range(width):
        x = np.float32(i - half_width)
        x = np.float32(np.float64(x) / (sigma + DBL_EPSILON))
        kernel[i] = np.float32(math.exp(float(np.float64(-0.5) * np.float64(x) * np.float64(x))))
        acc = np.float32(acc + kernel[i])
    for i in range(width):
        kernel[i] = np.float32(kernel[i] / acc)
    return kernel


# ---------------------------------------------------------------------------
# Smoothing matrix: exact reference boundary semantics as a static operator
# ---------------------------------------------------------------------------

def smoothing_matrix(n: int, kernel: np.ndarray) -> np.ndarray:
    """(n, n) float32 matrix W with out[x] = sum_j W[x, j] * in[j] equal to one
    axis pass of GaussianSmooth_3D_Imp (Src/cSIFT3D.cc:624-790)."""
    width = len(kernel)
    hw = width // 2
    dim_end = n - 1
    W = np.zeros((n, n), dtype=np.float32)

    int_lo, int_hi = hw, n - hw - 2  # interior row range (inclusive)

    for x in range(n):
        if int_lo <= x <= int_hi:
            # Interior: taps at x - d for d in [-hw, hw]; frac == 0 exactly.
            for d in range(-hw, hw + 1):
                W[x, x - d] += kernel[d + hw]
        else:
            # Boundary row: mirror logic (Src/cSIFT3D.cc:736-785).
            for d in range(-hw, hw + 1):
                tap = kernel[d + hw]
                c = np.float32(np.float32(x) - np.float32(d))
                if c < 0:
                    c = np.float32(-c)
                elif c >= dim_end:
                    c = np.float32(np.float32(2 * dim_end) - c - np.float32(CONV_EPS))
                idx_lo = int(c)  # trunc-toward-zero like the C cast
                frac = np.float32(c - np.float32(idx_lo))
                idx_hi = idx_lo + 1
                # Reference would read OOB here for extreme kernels; clamp.
                idx_lo = min(max(idx_lo, 0), n - 1)
                idx_hi = min(max(idx_hi, 0), n - 1)
                W[x, idx_lo] += np.float32(tap * np.float32(np.float32(1.0) - frac))
                W[x, idx_hi] += np.float32(tap * frac)
    return W


# ---------------------------------------------------------------------------
# Pyramid plan: static per-(octave, level) metadata
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LevelMeta:
    octave: int
    level: int
    shape: tuple[int, int, int]  # (nz, ny, nx)
    unit: float                  # voxel unit (2^octave; isotropic input assumed 1.0)
    scale: float                 # sigma0 * 2^(octave + level/num_kp_levels)


@dataclasses.dataclass(frozen=True)
class PyramidPlan:
    """Everything static the pipeline needs for a given input shape."""

    cfg: SiftConfig
    input_shape: tuple[int, int, int]  # (nz, ny, nx)
    num_octaves: int
    gss: tuple[LevelMeta, ...]   # len = num_octaves * gss_levels
    dog: tuple[LevelMeta, ...]   # len = num_octaves * dog_levels
    sigmas: tuple[float, ...]    # incremental blur per GSS level
    base_sig: float

    def gss_meta(self, o: int, s: int) -> LevelMeta:
        return self.gss[o * self.cfg.gss_levels + s]

    def dog_meta(self, o: int, s: int) -> LevelMeta:
        return self.dog[o * self.cfg.dog_levels + s]


def make_plan(cfg: SiftConfig, shape: tuple[int, int, int]) -> PyramidPlan:
    """Build the static pyramid plan for a (nz, ny, nx) input volume.

    Dimension/unit/scale bookkeeping mirrors Initialize_Pyramid
    (Src/cUtil.cc:177-235): dims halve (integer division) and units double
    per octave; scale = sigma0 * 2^(o + s/num_kp_levels).
    """
    cfg = cfg.resolve_caps(shape)
    nz, ny, nx = shape
    noct = cfg.num_octaves((nx, ny, nz))
    if noct < 1:
        raise ValueError(f"volume {shape} too small for SIFT pyramid")
    sigma0 = cfg.sigma0()

    def levels(count: int) -> tuple[LevelMeta, ...]:
        metas = []
        cz, cy, cx, u = nz, ny, nx, 1.0
        for o in range(noct):
            for s in range(count):
                scale = sigma0 * 2.0 ** (o + s / cfg.num_kp_levels)
                metas.append(LevelMeta(o, s, (cz, cy, cx), u, float(np.float32(scale))))
            cz //= 2
            cy //= 2
            cx //= 2
            u *= 2.0
        return tuple(metas)

    sig = sigma_schedule(cfg)
    return PyramidPlan(
        cfg=cfg,
        input_shape=shape,
        num_octaves=noct,
        gss=levels(cfg.gss_levels),
        dog=levels(cfg.dog_levels),
        sigmas=tuple(float(s) for s in sig),
        base_sig=base_sigma(cfg),
    )
