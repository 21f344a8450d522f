"""Configuration for the TPU-native 3D SIFT pipeline.

Mirrors every algorithm knob of the reference implementation so that the
numerical pipeline is parameter-for-parameter compatible:

- compile-time macros: ``Include/cSIFT3D.h:13-27`` (SIGMA_DEFAULT,
  SIGMA_N_DEFAULT, NUM_KP_LEVELS, PEAK_THRESH, EIG_THRES, CORNER_THRESH,
  IMG_BORDER, NHIST_PER_DIM, ICOS_NFACES, ICOS_NVERT, DESC_NUMEL)
- internal constants: ``Src/cSIFT3D.cc:22-31`` (ori_grad_thresh, bary_eps,
  trunc_thresh, ori_sig_fctr, ori_rad_fctr, desc_sig_fctr, desc_rad_fctr)
- factory defaults: ``Include/cSIFT3D.h:187-202``
"""

from __future__ import annotations

import dataclasses
import math

# -- compile-time macros of the reference (Include/cSIFT3D.h:13-27) --------
SIGMA_DEFAULT = 1.6
SIGMA_N_DEFAULT = 1.15
NUM_KP_LEVELS = 3
PEAK_THRESH = 0.1
EIG_THRES = 0.9
CORNER_THRESH = 0.4
IMG_BORDER = 1
NHIST_PER_DIM = 4
ICOS_NFACES = 20
ICOS_NVERT = 12
DESC_NUMEL = NHIST_PER_DIM ** 3 * ICOS_NVERT  # 768

# -- internal constants (Src/cSIFT3D.cc:22-31) ------------------------------
ORI_GRAD_THRESH = 1e-10
# bary_eps = FLT_EPSILON * 1E1  (Src/cSIFT3D.cc:23)
BARY_EPS = float.fromhex("0x1p-23") * 10.0
TRUNC_THRESH = 0.2 * 128 / DESC_NUMEL
ORI_SIG_FCTR = 1.5
ORI_RAD_FCTR = 3.0
DESC_SIG_FCTR = 7.071067812
DESC_RAD_FCTR = 2.0

# Boundary-mirror epsilon of the separable convolution (Src/cSIFT3D.cc:636)
CONV_EPS = 0.1

# DBL_EPSILON, used by DistinctEig (Src/cSIFT3D.cc:1140-1150) and the
# descriptor normalisation (Src/cSIFT3D.cc:1649).
DBL_EPSILON = float.fromhex("0x1p-52")


@dataclasses.dataclass(frozen=True)
class SiftConfig:
    """Frozen algorithm configuration (factory defaults of the reference).

    Extra fields beyond the reference's knobs control the static-shape
    behaviour of the TPU pipeline (keypoint capacities), which have no CPU
    counterpart because the reference uses dynamically sized ``std::vector``.
    """

    num_kp_levels: int = NUM_KP_LEVELS
    sigma_default: float = SIGMA_DEFAULT
    sigma_n_default: float = SIGMA_N_DEFAULT
    peak_thresh: float = PEAK_THRESH
    max_eig_thres: float = EIG_THRES
    corner_thresh: float = CORNER_THRESH

    # TPU static-shape knobs -------------------------------------------------
    # Max keypoints retained per level of octave 0; detection compacts the
    # extremum mask into this capacity (row-major order, like the reference's
    # z-y-x scan at Src/cSIFT3D.cc:388-417). Higher octaves hold 8x fewer
    # voxels per step, so their capacity decays by `cap_octave_decay` bits
    # per octave down to `cap_floor` (post-detection stages are vectorised
    # over the full capacity, so oversized caps cost real time).
    #
    # None = auto-size from the input volume at plan time (resolve_caps):
    # max(4096, nvox/1024) — the measured full-recall requirement is 16384
    # at 256^3 and 131072 at 512^3, i.e. ~nvox/1024, and a fixed default
    # silently drops extrema on big volumes (the reference's std::vector
    # grows unboundedly, Src/cSIFT3D.cc:417).
    max_kp_per_level: int | None = None
    cap_octave_decay: int = 3
    cap_floor: int = 512
    # Keypoint batch size for the orientation/descriptor window stages.
    kp_block: int = 32
    # Descriptor binning backend: None = auto (Pallas kernel on TPU, XLA
    # elsewhere); True/False forces.
    use_pallas: bool | None = None

    def resolve_caps(self, shape: tuple[int, int, int]) -> "SiftConfig":
        """Concrete capacities for a volume shape (no-op if already set).

        Auto rule: max(4096, next_pow2(nvox / 1024)) — tracks the measured
        zero-dropped-extrema requirement (16384 at 256^3, 131072 at 512^3)
        so default-config users keep full recall at any volume size.

        Ceiling 131072 (the 512^3 value; sizes <= 512^3 are unchanged):
        beyond it, per-level keypoint buffers themselves become the HBM
        bottleneck (the uncapped rule would want 524288 lanes/level at
        768^3 — ~9 GB of descriptor capacity for a realistic population of
        a few 10k). A level that genuinely overflows is still DETECTED
        (counts > caps -> dropped_by_cap / the compaction RuntimeWarning);
        raise max_kp_per_level explicitly to trade HBM for headroom — the
        reference has no cap only because its vectors grow in host RAM
        (Src/cSIFT3D.cc keypoint push_back).
        """
        if self.max_kp_per_level is not None:
            return self
        nvox = math.prod(shape)
        cap = max(4096, 1 << max(0, nvox // 1024 - 1).bit_length())
        return dataclasses.replace(self, max_kp_per_level=min(cap, 131072))

    def cap_for_octave(self, octave: int) -> int:
        if self.max_kp_per_level is None:
            raise ValueError(
                "max_kp_per_level is auto (None); resolve it against a "
                "volume shape first via cfg.resolve_caps(shape) / make_plan")
        cap = self.max_kp_per_level >> (self.cap_octave_decay * octave)
        return max(cap, min(self.cap_floor, self.max_kp_per_level))

    @property
    def gss_levels(self) -> int:
        return self.num_kp_levels + 3

    @property
    def dog_levels(self) -> int:
        return self.num_kp_levels + 2

    def num_octaves(self, shape: tuple[int, int, int]) -> int:
        """octave_num = floor(log2(min dim)) - 3 + 1 (Src/cSIFT3D.cc:254-255)."""
        m = min(shape)
        return int(math.log2(float(m))) - 3 + 1

    def sigma0(self) -> float:
        """Base scale sigma0 = sigma_default * 2^(-1/3).

        The exponent is a hard-coded 1/3 in the reference (Src/cSIFT3D.cc:275
        and Src/cUtil.cc:182), independent of num_kp_levels; we replicate that.
        """
        return self.sigma_default * 2.0 ** (-1.0 / 3.0)
