"""Gaussian scale-space ops for TPU: blur as MXU matmuls.

The reference's separable blur (`GaussianSmooth_3D`, Src/cSIFT3D.cc:535-622)
does, per axis: a scalar tap loop with a two-pass interior/boundary scheme,
plus two full-volume permutes per axis so the convolution always runs along
the fastest axis. On TPU we fold each axis pass — with the reference's exact
boundary semantics — into a static (n, n) float32 smoothing matrix
(see sift3d_tpu.pyramid.smoothing_matrix) and contract it against the volume
with einsum. XLA maps each contraction onto the MXU; there are no permutes,
no boundary branches, and the whole blur is three back-to-back matmuls that
run close to HBM speed-of-light for realistic volume sizes.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..pyramid import gaussian_kernel, smoothing_matrix


import contextlib

# The GSPMD-sharded path needs the plain-XLA blur: the SPMD partitioner can
# shard the einsum but not a pallas_call.
_FORCE_XLA = [False]
USE_PALLAS_BLUR = [False]

# Blur einsum MXU precision. HIGHEST (6 bf16 passes) is the parity-safe
# default; SIFT3D_BLUR_PRECISION=high (3 passes) is an A/B knob that must
# be gated on exact keypoint-set equality (detection's strict-inequality
# extremum test is threshold-sensitive). Read at import: modules are
# jit-cached.
import os as _os

import jax as _jax

BLUR_PRECISION = [
    _jax.lax.Precision.HIGH
    if _os.environ.get("SIFT3D_BLUR_PRECISION", "highest") == "high"
    else _jax.lax.Precision.HIGHEST
]

# Blur implementation: "taps2" (streaming Pallas shift-FMA kernel,
# ops/pallas/blur_kernel2.py — the default) or "einsum" (dense
# smoothing-matrix, the r1/r2 default). Measured on TPU v5e at 256^3
# (EVIDENCE_r3): taps2 0.9 ms/blur device vs einsum 1.7 ms (~459 GB/s
# effective on the 6V compulsory-traffic model — at the measured copy
# roofline), with IDENTICAL keypoint and match sets, 0.1-0.2% of
# descriptors shifted >1e-3 by icosahedral face-edge flips (inside the
# documented parity bar), and ~50x tighter oracle pyramid parity (1.8e-7
# vs ~1e-5: the kernel reproduces the reference's d-order tap
# accumulation exactly where the einsum's K=n matmul only approximates
# it).
BLUR_IMPL = [_os.environ.get("SIFT3D_BLUR_IMPL", "taps2")]


@contextlib.contextmanager
def xla_blur():
    _FORCE_XLA[0] = True
    try:
        yield
    finally:
        _FORCE_XLA[0] = False


@functools.lru_cache(maxsize=None)
def _smoothing_matrix_cached(n: int, sigma: float) -> np.ndarray:
    return smoothing_matrix(n, gaussian_kernel(sigma))


def blur_operators(shape: tuple[int, int, int], sigma: float):
    """Per-axis smoothing matrices (Wz, Wy, Wx) for a (nz, ny, nx) volume."""
    nz, ny, nx = shape
    return (
        _smoothing_matrix_cached(nz, float(sigma)),
        _smoothing_matrix_cached(ny, float(sigma)),
        _smoothing_matrix_cached(nx, float(sigma)),
    )


def gaussian_blur(vol: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable blur with reference axis order X -> Y -> Z
    (Src/cSIFT3D.cc:608-617). vol: (nz, ny, nx) float32.

    On TPU the streaming tap kernel runs by default (BLUR_IMPL "taps2",
    ops/pallas/blur_kernel2.py: shift-FMA interior, exact boundary bands);
    the dense smoothing-matrix einsum below serves CPU, the GSPMD-sharded
    path (xla_blur), and shapes outside the kernel's envelope.

    precision=HIGHEST keeps the einsum's MXU passes in true float32 — the
    TPU default (bf16 passes) would move keypoints relative to the CPU
    reference (measured: EVIDENCE_r3 ab_blur_high).
    """
    import jax

    # The tap-based Pallas blur v1 is opt-in: it is boundary-exact and
    # FLOP-lean, but its per-slab transposes make it ~1.6x slower than the
    # einsum on v5e (1.83ms vs 1.17ms per 256^3 blur); the dense
    # smoothing-matrix einsum already runs near memory bandwidth.
    if USE_PALLAS_BLUR[0] and jax.default_backend() == "tpu" and not _FORCE_XLA[0]:
        from .pallas.blur_kernel import gaussian_blur_pallas

        return gaussian_blur_pallas(vol, float(sigma))

    # v2 streaming tap kernel (no transposes, no K=n contraction): interior
    # rows via shift-FMAs, boundary bands via the exact smoothing-matrix
    # rows. Layout-free only for ny % 8 == 0 and wide-enough dims.
    if BLUR_IMPL[0] == "taps2" and not _FORCE_XLA[0] and (
        jax.default_backend() == "tpu"
    ):
        from .pallas.blur_kernel2 import gaussian_blur_pallas2, z_lane_chunk
        from ..pyramid import gaussian_kernel as _gk

        hw = len(_gk(float(sigma))) // 2
        nz, ny, nx = vol.shape
        if (ny % 8 == 0 and min(nz, ny, nx) >= 2 * hw + 2
                and z_lane_chunk(nz, nx) is not None):
            return gaussian_blur_pallas2(vol, float(sigma))

    hi = BLUR_PRECISION[0]
    Wz, Wy, Wx = blur_operators(vol.shape, sigma)
    out = jnp.einsum("xj,zyj->zyx", jnp.asarray(Wx), vol,
                     preferred_element_type=jnp.float32, precision=hi)
    out = jnp.einsum("yj,zjx->zyx", jnp.asarray(Wy), out,
                     preferred_element_type=jnp.float32, precision=hi)
    out = jnp.einsum("zj,jyx->zyx", jnp.asarray(Wz), out,
                     preferred_element_type=jnp.float32, precision=hi)
    return out


@functools.lru_cache(maxsize=None)
def _even_lane_selector(nx: int) -> np.ndarray:
    S = np.zeros((nx // 2, nx), np.float32)
    S[np.arange(nx // 2), 2 * np.arange(nx // 2)] = 1.0
    return S


def downsample(vol: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 decimation, dims halve by integer division
    (DownSample_3D, Src/cSIFT3D.cc:506-533).

    The x (lane) axis decimates via a 0/1 selection matmul instead of a
    strided slice: XLA lowers a lane-strided slice feeding a flat-layout
    consumer as a linear gather of the whole level — measured 29.5 ms
    device vs 0.32 ms for the matmul at 256^3 (exact: each output sums one
    x*1.0 product at f32-HIGHEST). z/y strides stay plain slices (major/
    sublane strides lower fine). The matmul is a TPU-layout workaround
    only: on CPU (tests/oracle paths) the plain O(1)-per-voxel strided
    slice is kept (advisor r3)."""
    nz, ny, nx = vol.shape
    if _jax.default_backend() != "tpu":
        return vol[: 2 * (nz // 2) : 2, : 2 * (ny // 2) : 2,
                   : 2 * (nx // 2) : 2]
    S = jnp.asarray(_even_lane_selector(nx))
    x_dec = jnp.einsum("xj,zyj->zyx", S, vol,
                       preferred_element_type=jnp.float32,
                       precision=_jax.lax.Precision.HIGHEST)
    return x_dec[: 2 * (nz // 2) : 2, : 2 * (ny // 2) : 2, :]


def dog(prev: jnp.ndarray, cur: jnp.ndarray) -> jnp.ndarray:
    """DoG = prev - cur (Sub computes (cur - prev) * -1, Src/cSIFT3D.cc:875)."""
    return prev - cur


def data_scale(vol: jnp.ndarray) -> jnp.ndarray:
    """Normalise by max |voxel| (data_scale, Src/cUtil.cc:553-577)."""
    m = jnp.max(jnp.abs(vol))
    return jnp.where(m > 0, vol / m, vol)
