"""CPU oracle for brute-force descriptor matching (Src/cMatcher.cc).

Semantics replicated:
- calMatches (Src/cMatcher.cc:40-79): per query, top-2 descriptor dot
  products (strict ``>`` so earlier target index wins ties), distances
  d = 2 - 2*dot; masked queries get index -1.
- filter (Src/cMatcher.cc:81-97): reject when d1/d2 >= threshold^2.
- countMatched/toMask (Src/cMatcher.cc:114-131): per-target match counts;
  mask = count > 0 (biject) or count > 1 (enhanced).
- bijectFilter (Src/cMatcher.cc:133-144): reject ref i when its target is
  masked and the target's best reverse match is not i.

Index-0 quirk (replicated by default): the reference marks a rejected match
by negating its index (``gIdx *= -1``, Src/cMatcher.cc:93 and :141), which
is a no-op for index 0 — a forward match to target 0 can never be rejected
by the ratio test or the biject disagreement test, and a reverse match to
ref 0 can never be rejected by the reverse ratio test. Verified against the
actual reference binary (tools/reference_parity.py): the reference's 64^3
enhancedMatch output contains ratio-test failures whose best target is
tar[0]. Pass ``index0_quirk=False`` for strict explicit-validity semantics.
"""

from __future__ import annotations

import numpy as np

INJECT, BIJECT, ENHANCED = 0, 1, 2


def cal_matches(ref_desc: np.ndarray, tar_desc: np.ndarray, mask: np.ndarray | None = None):
    """Top-2 dots. Returns (d1, d2, i1, i2) with d = 2 - 2*dot.

    Products float32, accumulation float64 (KP_squareSum accumulates the
    float products in a double, Src/cMatcher.cc:17-23).
    """
    n = ref_desc.shape[0]
    scores = ref_desc.astype(np.float64) @ tar_desc.astype(np.float64).T  # (N, M)
    i1 = np.argmax(scores, axis=1)
    d1 = scores[np.arange(n), i1]
    scores2 = scores.copy()
    scores2[np.arange(n), i1] = -np.inf
    i2 = np.argmax(scores2, axis=1)
    d2 = scores2[np.arange(n), i2]
    # FLT_MIN init: if every dot <= FLT_MIN the index stays -1
    flt_min = np.finfo(np.float32).tiny
    i1 = np.where(d1 > flt_min, i1, -1)
    i2 = np.where(d2 > flt_min, i2, -1)
    d1 = 2.0 - 2.0 * d1
    d2 = 2.0 - 2.0 * d2
    if mask is not None:
        i1 = np.where(mask == 0, -1, i1)
    return d1, d2, i1.astype(np.int64), i2.astype(np.int64)


def ratio_filter(i1: np.ndarray, d1: np.ndarray, d2: np.ndarray,
                 threshold: float, index0_quirk: bool = True):
    """Boolean validity after the ratio test (index-0 quirk: see module
    docstring)."""
    thr2 = float(threshold) * float(threshold)
    valid = i1 >= 0
    with np.errstate(divide="ignore", invalid="ignore"):
        reject = (d1 / d2) >= thr2
    if index0_quirk:
        reject = reject & (i1 != 0)
    return valid & ~reject


def match(
    ref_desc: np.ndarray,
    tar_desc: np.ndarray,
    threshold: float = 0.85,
    mode: int = ENHANCED,
    index0_quirk: bool = True,
):
    """Returns (ref_indices, tar_indices) of surviving pairs, in ref order."""
    n, m = ref_desc.shape[0], tar_desc.shape[0]
    d1, d2, i1, _ = cal_matches(ref_desc, tar_desc)
    fwd_valid = ratio_filter(i1, d1, d2, threshold, index0_quirk)

    if mode != INJECT:
        count_thres = 0 if mode == BIJECT else 1
        counts = np.bincount(i1[fwd_valid & (i1 >= 0)], minlength=m)
        tmask = (counts > count_thres).astype(np.int64)

        rd1, rd2, ri1, _ = cal_matches(tar_desc, ref_desc, mask=tmask)
        rev_valid = ratio_filter(ri1, rd1, rd2, threshold, index0_quirk)
        ri1_eff = np.where(rev_valid, ri1, -1)

        keep = fwd_valid.copy()
        for i in range(n):
            if not fwd_valid[i]:
                continue
            j = i1[i]
            if index0_quirk and j == 0:
                continue  # bijectFilter's *= -1 cannot reject index 0
            if tmask[j] == 0:
                continue
            if ri1_eff[j] != i:
                keep[i] = False
        fwd_valid = keep

    ref_idx = np.nonzero(fwd_valid)[0]
    tar_idx = i1[ref_idx]
    return ref_idx, tar_idx


def match_coords(ref_kps, tar_kps, threshold: float = 0.85, mode: int = ENHANCED):
    """enhancedMatch-style output: original-image coordinate pairs
    (toCvec, Src/cMatcher.cc:99-112)."""
    ref_desc = np.stack([k.desc for k in ref_kps])
    tar_desc = np.stack([k.desc for k in tar_kps])
    ri, ti = match(ref_desc, tar_desc, threshold, mode)
    ref_c = np.array([[ref_kps[i].rx, ref_kps[i].ry, ref_kps[i].rz] for i in ri])
    tar_c = np.array([[tar_kps[j].rx, tar_kps[j].ry, tar_kps[j].rz] for j in ti])
    return ref_c, tar_c
