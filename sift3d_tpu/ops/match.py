"""Brute-force descriptor matching on the MXU.

The reference's matcher (Src/cMatcher.cc:40-79) is an O(N*M*768) scalar loop
tracking top-2 dot products per query. TPU-first equivalent: the score
matrix is one (N, 768) x (768, M) matmul evaluated in row-chunks (so N*M
never materialises in full), with a vectorised top-2 reduction. The
inject/biject/enhanced mask logic (Src/cMatcher.cc:114-215) becomes pure
gather/segment-sum arithmetic.

Semantics replicated:
- strict '>' top-2 updates => earlier target index wins ties (argmax picks
  the first maximum);
- d = 2 - 2*dot squared-L2 distances of unit descriptors;
- ratio test rejects when d1/d2 >= threshold^2;
- enhanced mode re-matches only "ambiguous" targets (matched by >1 query,
  toMask countThres=1); biject mode all matched targets (countThres=0);
- bijectFilter keeps a forward pair unless its target is masked and the
  target's best reverse match disagrees.

Index-0 quirk (REPLICATED BY DEFAULT — ``index0_quirk=True`` everywhere):
the reference flags rejected matches by negating the index, which cannot
flag target index 0 (``gIdx_[i] *= -1``, Src/cMatcher.cc:93, and the
bijectFilter's ``refIdx_[i] *= -1``, Src/cMatcher.cc:141). A best-match to
tar[0] therefore survives the ratio test and the reverse-disagreement test
unconditionally, and this is observable in the reference's own output
(two d1/d2 = 0.98/0.94 failures kept at 64^3). We carry explicit validity
booleans internally, then re-admit index-0 matches to reproduce the quirk;
``index0_quirk=False`` opts into strict semantics. CLAUDE.md/DESIGN.md:
quirk-on is the parity configuration — do not change the default.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

INJECT, BIJECT, ENHANCED = 0, 1, 2
_FLT_MIN = 1.1754943508222875e-38  # FLT_MIN init of the top-2 scan

# Default score-matmul precision: HIGHEST = true f32 (6 bf16 MXU passes).
# HIGH (3 passes, ~2x faster) is a candidate once match-set equality is
# verified on hardware. NOTE: this is read at trace time — mutating it does
# not invalidate already-jitted matchers; pass `precision=` explicitly (a
# static arg) to A/B without jax.clear_caches(). The env knob (read at
# import, like the descriptor-kernel knobs) exists for whole-pipeline A/Bs
# via benchmarks/ab_knobs.py.
import os as _os

SCORE_PRECISION = [
    jax.lax.Precision.HIGH
    if _os.environ.get("SIFT3D_MATCH_PRECISION", "highest") == "high"
    else jax.lax.Precision.HIGHEST
]


class Top2(NamedTuple):
    d1: jnp.ndarray  # (N,) f32 best distance 2-2*dot
    d2: jnp.ndarray  # (N,) f32 second-best distance
    i1: jnp.ndarray  # (N,) int32 best target (-1 invalid)


class MatchResult(NamedTuple):
    tar_idx: jnp.ndarray  # (N,) int32 matched target per ref (-1 if none)
    valid: jnp.ndarray    # (N,) bool


def _use_pallas_top2(flag=None) -> bool:
    if flag is not None:
        return flag
    return jax.default_backend() == "tpu"


def top2_scores(
    ref_desc: jnp.ndarray,
    tar_desc: jnp.ndarray,
    ref_valid: jnp.ndarray,
    tar_valid: jnp.ndarray,
    row_chunk: int = 1024,
    use_pallas=None,
    precision=None,
) -> Top2:
    """Top-2 dot products per ref row. Invalid targets can never be
    selected. On TPU the tiled Pallas kernel keeps score tiles in VMEM
    (ops/pallas/match_kernel.py); the XLA fallback materialises chunked
    score matrices."""
    n = ref_desc.shape[0]
    neg = jnp.float32(-jnp.inf)
    # Canonicalize (strings/ints -> enum) so the kernel's `precision ==
    # Precision.HIGH` comparison works; `or` would also misroute falsy
    # values, so test None explicitly.
    precision = (
        jax.lax.Precision(precision) if precision is not None
        else SCORE_PRECISION[0]
    )

    if _use_pallas_top2(use_pallas):
        from .pallas.match_kernel import CM, RN, top2_scores_pallas

        m = tar_desc.shape[0]
        np_ = -(-n // RN) * RN
        mp = -(-m // CM) * CM
        ref_p = jnp.pad(ref_desc, ((0, np_ - n), (0, 0)))
        tar_p = jnp.pad(tar_desc, ((0, mp - m), (0, 0)))
        mask = jnp.full(mp, neg).at[:m].set(jnp.where(tar_valid, 0.0, neg))
        s1, s2, i1 = top2_scores_pallas(
            ref_p, tar_p, mask, precision,
            interpret=jax.default_backend() != "tpu",
        )
        s1, s2, i1 = s1[:n], s2[:n], i1[:n]
    else:
        nchunks = -(-n // row_chunk)
        pad = nchunks * row_chunk - n
        ref_p = jnp.pad(ref_desc, ((0, pad), (0, 0)))
        tmask = jnp.where(tar_valid, 0.0, neg)[None, :]

        def chunk(i):
            rows = jax.lax.dynamic_slice_in_dim(ref_p, i * row_chunk, row_chunk)
            scores = (
                jnp.dot(rows, tar_desc.T, preferred_element_type=jnp.float32,
                        precision=precision) + tmask
            )
            i1 = jnp.argmax(scores, axis=1)
            s1 = jnp.max(scores, axis=1)
            scores2 = scores.at[jnp.arange(row_chunk), i1].set(neg)
            s2 = jnp.max(scores2, axis=1)
            return s1, s2, i1.astype(jnp.int32)

        s1, s2, i1 = jax.lax.map(chunk, jnp.arange(nchunks))
        s1 = s1.reshape(-1)[:n]
        s2 = s2.reshape(-1)[:n]
        i1 = i1.reshape(-1)[:n]

    # FLT_MIN init: selections require dot > FLT_MIN (Src/cMatcher.cc:54-69).
    i1 = jnp.where((s1 > _FLT_MIN) & ref_valid, i1, -1)
    return Top2(
        d1=2.0 - 2.0 * s1,
        d2=2.0 - 2.0 * s2,
        i1=i1,
    )


def ratio_filter(t: Top2, threshold, index0_quirk: bool = True) -> jnp.ndarray:
    """Validity after the ratio test (filter, Src/cMatcher.cc:81-97).

    index0_quirk replicates the reference's negate-to-reject encoding
    (``gIdx_[i] *= -1``, Src/cMatcher.cc:93): negating index 0 is a no-op,
    so a match whose best target is index 0 can never be rejected by the
    ratio test. Verified against the actual reference binary
    (tools/reference_parity.py): at 64^3 two ref keypoints whose best
    target was tar[0] failed the ratio test (d1/d2 = 0.98, 0.94) yet
    appear in the reference's enhancedMatch output. Pass False for the
    strict explicit-validity semantics."""
    thr2 = jnp.float32(threshold) * jnp.float32(threshold)
    passed = ~(t.d1 / t.d2 >= thr2)
    if index0_quirk:
        passed = passed | (t.i1 == 0)
    return (t.i1 >= 0) & passed


@functools.partial(jax.jit, static_argnames=(
    "mode", "row_chunk", "precision", "index0_quirk"))
def match_descriptors(
    ref_desc: jnp.ndarray,
    tar_desc: jnp.ndarray,
    ref_valid: jnp.ndarray,
    tar_valid: jnp.ndarray,
    threshold: float = 0.85,
    mode: int = ENHANCED,
    row_chunk: int = 1024,
    precision=None,
    index0_quirk: bool = True,
) -> MatchResult:
    n, m = ref_desc.shape[0], tar_desc.shape[0]
    fwd = top2_scores(ref_desc, tar_desc, ref_valid, tar_valid, row_chunk,
                      precision=precision)
    fwd_valid = ratio_filter(fwd, threshold, index0_quirk)

    if mode == INJECT:
        return MatchResult(
            tar_idx=jnp.where(fwd_valid, fwd.i1, -1), valid=fwd_valid
        )

    count_thres = 0 if mode == BIJECT else 1
    safe_i1 = jnp.where(fwd_valid, fwd.i1, m)  # out-of-range drops
    counts = jnp.zeros(m + 1, jnp.int32).at[safe_i1].add(1)[:m]
    tmask = counts > count_thres

    rev = top2_scores(tar_desc, ref_desc, tar_valid & tmask, ref_valid,
                      row_chunk, precision=precision)
    rev_valid = ratio_filter(rev, threshold, index0_quirk)
    rev_best = jnp.where(rev_valid, rev.i1, -1)

    j = jnp.clip(fwd.i1, 0, m - 1)
    ambiguous = tmask[j]
    agrees = rev_best[j] == jnp.arange(n)
    keep = fwd_valid & (~ambiguous | agrees)
    if index0_quirk:
        # bijectFilter's negate-to-reject (refIdx_[i] *= -1,
        # Src/cMatcher.cc:141) is likewise a no-op when the stored target
        # index is 0: a kept forward match to tar[0] survives the reverse
        # disagreement test unconditionally.
        keep = keep | (fwd_valid & (fwd.i1 == 0))
    return MatchResult(tar_idx=jnp.where(keep, fwd.i1, -1), valid=keep)


def match_coords(
    ref_rxyz: jnp.ndarray,
    tar_rxyz: jnp.ndarray,
    result: MatchResult,
):
    """Original-image coordinate pairs (toCvec, Src/cMatcher.cc:99-112).

    Returns (ref_coords, tar_coords, valid): (N, 3) arrays where invalid
    rows are zero; callers compact with the mask.
    """
    j = jnp.clip(result.tar_idx, 0, tar_rxyz.shape[0] - 1)
    ref_c = jnp.where(result.valid[:, None], ref_rxyz, 0.0)
    tar_c = jnp.where(result.valid[:, None], tar_rxyz[j], 0.0)
    return ref_c, tar_c, result.valid


# Phase jits for match_descriptors_timed, hoisted to module level so a
# caller looping over match_descriptors_timed hits the jit cache instead of
# re-tracing every call (static args key the cache on shapes-independent
# knobs; shape changes retrace as usual).
_top2_timed = jax.jit(top2_scores, static_argnames=("row_chunk",))
_filter_timed = jax.jit(ratio_filter, static_argnames=("index0_quirk",))


@functools.partial(jax.jit, static_argnames=("m", "count_thres"))
def _count_phase(fwd_i1, fwd_valid, m, count_thres):
    safe_i1 = jnp.where(fwd_valid, fwd_i1, m)
    counts = jnp.zeros(m + 1, jnp.int32).at[safe_i1].add(1)[:m]
    return counts > count_thres


@functools.partial(jax.jit, static_argnames=("m", "index0_quirk"))
def _biject_phase(fwd_i1, fwd_valid, rev_i1, rev_valid, tmask, m,
                  index0_quirk=True):
    n = fwd_i1.shape[0]
    rev_best = jnp.where(rev_valid, rev_i1, -1)
    j = jnp.clip(fwd_i1, 0, m - 1)
    keep = fwd_valid & (~tmask[j] | (rev_best[j] == jnp.arange(n)))
    if index0_quirk:  # see match_descriptors (Src/cMatcher.cc:141)
        keep = keep | (fwd_valid & (fwd_i1 == 0))
    return MatchResult(tar_idx=jnp.where(keep, fwd_i1, -1), valid=keep)


def match_descriptors_timed(
    ref_desc,
    tar_desc,
    ref_valid,
    tar_valid,
    threshold: float = 0.85,
    mode: int = ENHANCED,
    row_chunk: int = 1024,
    timer=None,
):
    """match_descriptors with the reference's per-phase timing breakdown.

    The reference times match / filter / countMatched / revMatch / revFilter
    / bijectFilter separately (Include/cMatcher.h:60-67,
    Src/cMatcher.cc:148-213). Each phase runs as its own blocked dispatch so
    the wall-clock split is observable; results are identical to
    match_descriptors. Returns (MatchResult, SiftTimer).
    """
    import jax as _jax

    from ..utils.timing import SiftTimer

    timer = timer or SiftTimer()
    m = tar_desc.shape[0]

    with timer.stage("match"):
        fwd = _top2_timed(ref_desc, tar_desc, ref_valid, tar_valid,
                          row_chunk=row_chunk)
        _jax.block_until_ready(fwd)
    with timer.stage("filter"):
        fwd_valid = _filter_timed(fwd, threshold)
        _jax.block_until_ready(fwd_valid)

    if mode == INJECT:
        result = MatchResult(
            tar_idx=jnp.where(fwd_valid, fwd.i1, -1), valid=fwd_valid
        )
        return result, timer

    count_thres = 0 if mode == BIJECT else 1

    with timer.stage("countMatched"):
        tmask = _count_phase(fwd.i1, fwd_valid, m, count_thres)
        _jax.block_until_ready(tmask)
    with timer.stage("revMatch"):
        rev = _top2_timed(tar_desc, ref_desc, tar_valid & tmask, ref_valid,
                          row_chunk=row_chunk)
        _jax.block_until_ready(rev)
    with timer.stage("revFilter"):
        rev_valid = _filter_timed(rev, threshold)
        _jax.block_until_ready(rev_valid)

    with timer.stage("bijectFilter"):
        result = _biject_phase(fwd.i1, fwd_valid, rev.i1, rev_valid, tmask, m)
        _jax.block_until_ready(result)
    return result, timer


def threshold_sweep(
    ref_desc, tar_desc, ref_valid, tar_valid, thresholds, mode: int = ENHANCED
):
    """Match at many ratio thresholds reusing one top-2 pass per direction
    (BASELINE config 3's 0.7-0.9 sweep). Returns stacked validity masks."""
    fwd = top2_scores(ref_desc, tar_desc, ref_valid, tar_valid)
    n, m = ref_desc.shape[0], tar_desc.shape[0]

    if mode == INJECT:
        return jax.vmap(lambda th: ratio_filter(fwd, th))(thresholds)

    rev_full = top2_scores(tar_desc, ref_desc, tar_valid, ref_valid)

    def at_threshold(th):
        fwd_valid = ratio_filter(fwd, th)
        count_thres = 0 if mode == BIJECT else 1
        safe_i1 = jnp.where(fwd_valid, fwd.i1, m)
        counts = jnp.zeros(m + 1, jnp.int32).at[safe_i1].add(1)[:m]
        tmask = counts > count_thres
        # Reverse top-2 was computed against all valid refs; masking only
        # invalidates targets, it does not change their best match.
        rev_valid = ratio_filter(rev_full, th) & tmask
        rev_best = jnp.where(rev_valid, rev_full.i1, -1)
        j = jnp.clip(fwd.i1, 0, m - 1)
        keep = fwd_valid & (~tmask[j] | (rev_best[j] == jnp.arange(n)))
        # index-0 quirk (see match_descriptors): a kept forward match to
        # tar[0] survives bijectFilter unconditionally.
        keep = keep | (fwd_valid & (fwd.i1 == 0))
        return keep

    return jax.vmap(at_threshold)(thresholds)
