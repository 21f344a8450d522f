"""Matcher parity: JAX matmul matcher vs CPU oracle matcher, all modes."""

import numpy as np
import pytest

import jax.numpy as jnp

from sift3d_tpu.ops import match as M
from sift3d_tpu.oracle import cpu_match


def _random_descs(n, seed):
    """Unit-norm, non-negative, sparse-ish descriptors like real SIFT ones."""
    rng = np.random.default_rng(seed)
    d = rng.random((n, 768)).astype(np.float32)
    d[d < 0.8] = 0.0
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
    return d


@pytest.mark.parametrize("mode", [M.INJECT, M.BIJECT, M.ENHANCED])
@pytest.mark.parametrize("threshold", [0.7, 0.85, 0.9])
def test_match_modes_vs_oracle(mode, threshold):
    ref = _random_descs(300, 0)
    tar = _random_descs(250, 1)
    # Make some strong correspondences
    tar[:100] = ref[:100] + 0.02 * _random_descs(100, 2)
    tar[:100] /= np.linalg.norm(tar[:100], axis=1, keepdims=True)

    res = M.match_descriptors(
        jnp.asarray(ref), jnp.asarray(tar),
        jnp.ones(300, bool), jnp.ones(250, bool),
        threshold, mode=mode, row_chunk=128,
    )
    got = {(i, int(t)) for i, (t, v) in enumerate(zip(np.asarray(res.tar_idx), np.asarray(res.valid))) if v}

    ri, ti = cpu_match.match(ref, tar, threshold, mode)
    want = set(zip(ri.tolist(), ti.tolist()))
    assert got == want


def test_invalid_lanes_never_match():
    ref = _random_descs(64, 3)
    tar = _random_descs(64, 4)
    ref_valid = np.zeros(64, bool); ref_valid[:10] = True
    tar_valid = np.zeros(64, bool); tar_valid[:10] = True
    tar[:10] = ref[:10]
    res = M.match_descriptors(
        jnp.asarray(ref), jnp.asarray(tar),
        jnp.asarray(ref_valid), jnp.asarray(tar_valid), 0.85, mode=M.INJECT,
    )
    v = np.asarray(res.valid)
    t = np.asarray(res.tar_idx)
    assert not v[10:].any()
    assert (t[v] < 10).all()


def test_threshold_sweep_consistent():
    ref = _random_descs(128, 5)
    tar = _random_descs(128, 6)
    tar[:50] = ref[:50]
    thresholds = jnp.asarray([0.7, 0.8, 0.85, 0.9], jnp.float32)
    masks = M.threshold_sweep(
        jnp.asarray(ref), jnp.asarray(tar),
        jnp.ones(128, bool), jnp.ones(128, bool),
        thresholds, mode=M.ENHANCED,
    )
    masks = np.asarray(masks)
    for k, th in enumerate([0.7, 0.8, 0.85, 0.9]):
        res = M.match_descriptors(
            jnp.asarray(ref), jnp.asarray(tar),
            jnp.ones(128, bool), jnp.ones(128, bool), th, mode=M.ENHANCED,
        )
        np.testing.assert_array_equal(masks[k], np.asarray(res.valid), err_msg=str(th))
    # monotone-ish: higher threshold keeps at least as many forward matches
    assert masks.sum(axis=1)[0] <= masks.sum(axis=1)[-1] + 5


def test_top2_pallas_matches_xla():
    """The tiled running-top-2 Pallas kernel (ops/pallas/match_kernel.py,
    interpret mode here) selects identical best indices to the XLA path —
    including duplicate-target exact ties (earliest index wins, reference
    scan order Src/cMatcher.cc:54-77) and invalid-target masks — with dot
    products equal to reduction-order ulps."""
    ref = _random_descs(300, 11)
    tar = _random_descs(1100, 12)
    tar[50] = tar[40]
    tar[900] = tar[40]  # exact ties across tile boundaries
    rng = np.random.default_rng(13)
    rv = rng.random(300) > 0.1
    tv = rng.random(1100) > 0.1

    a = M.top2_scores(jnp.asarray(ref), jnp.asarray(tar),
                      jnp.asarray(rv), jnp.asarray(tv), use_pallas=False)
    b = M.top2_scores(jnp.asarray(ref), jnp.asarray(tar),
                      jnp.asarray(rv), jnp.asarray(tv), use_pallas=True)
    np.testing.assert_array_equal(np.asarray(a.i1), np.asarray(b.i1))
    np.testing.assert_allclose(np.asarray(a.d1), np.asarray(b.d1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(a.d2), np.asarray(b.d2), atol=2e-6)


def test_index0_quirk_matches_reference_semantics():
    """The reference's negate-to-reject encoding cannot reject target
    index 0 (gIdx *= -1 is a no-op at 0, Src/cMatcher.cc:93,141): a ref
    keypoint whose best target is tar[0] survives the ratio test AND the
    biject filter regardless. Verified against the compiled reference
    binary (tools/reference_parity.py); index0_quirk=False restores strict
    semantics."""
    rng = np.random.default_rng(9)
    # two ref kps whose best match is tar[0] with a failing ratio test:
    # tar[0] and tar[1] nearly identical, both close to the ref kps.
    base = rng.random(768).astype(np.float32)
    base /= np.linalg.norm(base)
    jitter = rng.random((4, 768)).astype(np.float32) * 0.02
    ref = np.stack([base + jitter[0], base + jitter[1]])
    tar = np.stack([base + 0.001 * jitter[2], base + 0.001 * jitter[3]])
    ref /= np.linalg.norm(ref, axis=1, keepdims=True)
    tar /= np.linalg.norm(tar, axis=1, keepdims=True)
    ones_r = np.ones(2, bool)
    ones_t = np.ones(2, bool)

    quirk = M.match_descriptors(ref, tar, ones_r, ones_t, 0.85, M.ENHANCED)
    strict = M.match_descriptors(ref, tar, ones_r, ones_t, 0.85, M.ENHANCED,
                                 index0_quirk=False)
    kept_q = np.asarray(quirk.valid)
    kept_s = np.asarray(strict.valid)
    i1 = np.asarray(quirk.tar_idx)
    # with the quirk, every ref kp whose best target is 0 is kept
    assert all(kept_q[i] for i in range(2) if i1[i] == 0)
    assert kept_q.sum() > kept_s.sum()

    # oracle agrees with the quirk semantics
    ri, _ = cpu_match.match(ref, tar, 0.85, cpu_match.ENHANCED)
    assert set(np.where(kept_q)[0]) == set(ri.tolist())


def test_repeated_match_uses_bucket_guess_identically():
    """pipeline._match's guess-and-verify bucket dispatch must return
    identical results on repeat calls (the second call takes the guessed
    fast path with no host round-trip)."""
    import jax

    from sift3d_tpu import SIFT3D, enhanced_match
    from sift3d_tpu.oracle import fixtures

    vol_a = fixtures.smooth_random_volume((32, 32, 32), seed=3, smooth=2)
    vol_b = fixtures.smooth_random_volume((32, 32, 32), seed=4, smooth=2)
    sift = SIFT3D()
    ka, kb = sift.extract(vol_a), sift.extract(vol_b)
    r1 = enhanced_match(ka, kb, 0.85)
    r2 = enhanced_match(ka, kb, 0.85)
    v1, v2 = np.asarray(r1[2]), np.asarray(r2[2])
    c1 = np.sort(np.asarray(r1[0])[v1], axis=0)
    c2 = np.sort(np.asarray(r2[0])[v2], axis=0)
    assert v1.sum() == v2.sum()
    np.testing.assert_array_equal(c1, c2)
