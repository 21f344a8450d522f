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
