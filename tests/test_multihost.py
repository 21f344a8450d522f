"""Multi-host execution: 2 jax.distributed processes, 4+4 virtual CPU
devices, one global 8-device z-block mesh (VERDICT r1 item 5).

The workers run the full sharded extract+match step through
parallel/multihost.py (initialize / global_block_mesh / host_local_slice)
and must agree with the single-process unsharded pipeline on the same
volumes — the same equality test_sharded.py establishes for 1-process
sharding, here across a real process boundary with DCN-style collectives.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # Workers set their own XLA_FLAGS (4 virtual devices each); the parent
    # conftest's 8-device flag must not leak through.
    env["XLA_FLAGS"] = ""

    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
             str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=str(REPO),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=900)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-3000:]}"

    results = []
    for _, out, _ in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                results.append(json.loads(line[len("RESULT "):]))
    assert len(results) == 2, f"expected 2 result lines, got {results}"
    # both processes hold the same replicated outputs
    assert results[0] == results[1] or (
        results[0]["matches"] == results[1]["matches"]
        and results[0]["pairs"] == results[1]["pairs"]
    )

    # single-process ground truth (unsharded pipeline, same volumes)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from sift3d_tpu import SIFT3D, SiftConfig, enhanced_match
    from sift3d_tpu.oracle import fixtures

    shape = (32, 32, 32)
    ref_np = fixtures.smooth_random_volume(shape, seed=7, smooth=2)
    tar_np = fixtures.smooth_random_volume(shape, seed=8, smooth=2)
    sift = SIFT3D(SiftConfig(max_kp_per_level=256))
    kr, kt = sift.extract(ref_np), sift.extract(tar_np)
    rc, tc, valid = enhanced_match(kr, kt, 0.85)

    r = results[0]
    assert r["num_ref"] == int(np.asarray(kr.num_valid))
    assert r["num_tar"] == int(np.asarray(kt.num_valid))
    v = np.asarray(valid)
    expected = sorted(
        [np.asarray(rc)[i].tolist(), np.asarray(tc)[i].tolist()]
        for i in np.nonzero(v)[0]
    )
    assert r["matches"] == int(v.sum())
    assert r["pairs"] == expected
    # the 2-D (4,2) global mesh (z crossing hosts, y intra-host) agrees
    assert r["mesh2d_matches"] == int(v.sum())
    assert r["mesh2d_pairs_equal_1d"] is True
    # distributed pose-graph refinement (psum across the process boundary)
    # recovers the synthetic ground-truth poses
    assert r["posegraph_err"] < 1e-3, r["posegraph_err"]
