"""Worker process for the 2-process jax.distributed multi-host test.

Invoked by tests/test_multihost.py as:
    python tests/multihost_worker.py <port> <process_id> <num_processes>

Each process owns 4 virtual CPU devices; together they form the 8-device
global z-block mesh. Process 0 prints a JSON result line consumed by the
test. Exercises the real multi-host code path of BASELINE configs 4-5:
multihost.initialize -> global_block_mesh -> host_local_slice -> sharded
extract+match step (parallel/sharded.py).
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    + os.environ.get("XLA_FLAGS", "")
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")

    from sift3d_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * 4

    import numpy as np

    from sift3d_tpu import SiftConfig
    from sift3d_tpu.oracle import fixtures
    from sift3d_tpu.parallel.sharded import make_sharded_step

    mesh = multihost.global_block_mesh()
    assert mesh.devices.size == nproc * 4

    shape = (32, 32, 32)
    ref_np = fixtures.smooth_random_volume(shape, seed=7, smooth=2)
    tar_np = fixtures.smooth_random_volume(shape, seed=8, smooth=2)

    # Each host materialises only its own z-slab (the per-host input
    # pipeline of BASELINE config 5); host_local_slice gives the range.
    start, size = multihost.host_local_slice(shape, mesh)
    assert size == shape[0] // nproc

    cfg = SiftConfig(max_kp_per_level=256)
    step, vol_sharding = make_sharded_step(mesh, shape, cfg)

    def dist(vol_np):
        return jax.make_array_from_callback(
            shape, vol_sharding, lambda idx: vol_np[idx]
        )

    out = step(dist(ref_np), dist(tar_np))
    jax.block_until_ready(out)

    # match_valid / coords are replicated (descriptors are allgathered);
    # every process can read its local shard of the replicated value.
    valid = np.asarray(out["match_valid"].addressable_shards[0].data)
    rc = np.asarray(out["ref_coords"].addressable_shards[0].data)
    tc = np.asarray(out["tar_coords"].addressable_shards[0].data)
    result = {
        "pid": pid,
        "num_ref": int(np.asarray(out["num_ref"].addressable_shards[0].data)),
        "num_tar": int(np.asarray(out["num_tar"].addressable_shards[0].data)),
        "matches": int(valid.sum()),
        "pairs": sorted(
            (rc[i].tolist(), tc[i].tolist()) for i in np.nonzero(valid)[0]
        ),
    }

    # -- 2-D (z x y) global mesh across the process boundary --------------
    # (4, 2): each host's 4 devices fill two whole z-rows, so z-halos
    # cross hosts (DCN) while y-halos stay intra-host. Match pairs must
    # equal the 1-D global-mesh step's.
    mesh2 = multihost.global_block_mesh2d(2)
    start2, size2 = multihost.host_local_slice(shape, mesh2)
    assert size2 == shape[0] // nproc
    step2, vol_sharding2 = make_sharded_step(mesh2, shape, cfg)

    def dist2(vol_np):
        return jax.make_array_from_callback(
            shape, vol_sharding2, lambda idx: vol_np[idx]
        )

    out2 = step2(dist2(ref_np), dist2(tar_np))
    jax.block_until_ready(out2)
    valid2 = np.asarray(out2["match_valid"].addressable_shards[0].data)
    rc2 = np.asarray(out2["ref_coords"].addressable_shards[0].data)
    tc2 = np.asarray(out2["tar_coords"].addressable_shards[0].data)
    result["mesh2d_matches"] = int(valid2.sum())
    result["mesh2d_pairs_equal_1d"] = sorted(
        (rc2[i].tolist(), tc2[i].tolist()) for i in np.nonzero(valid2)[0]
    ) == result["pairs"]

    # -- distributed pose-graph refinement across the process boundary ----
    # (BASELINE config 5: the Gauss-Newton normal equations are assembled
    # per edge shard and psum-reduced over the 2-process global mesh.)
    import jax.numpy as jnp

    from sift3d_tpu.parallel import registration as R

    rng = np.random.default_rng(5)
    n_vol = 4

    def rand_pose():
        w = rng.standard_normal(3) * 0.2
        Rm = np.asarray(R.exp_so3(jnp.asarray(w[None]))[0])
        return Rm, rng.standard_normal(3).astype(np.float64)

    gt = [(np.eye(3), np.zeros(3))] + [rand_pose() for _ in range(n_vol - 1)]
    edges = [(i, j) for i in range(n_vol) for j in range(i + 1, n_vol)]
    # pad edge count (6) to the mesh size (8) with anchored self-edges
    edges += [(0, 0)] * ((-len(edges)) % mesh.devices.size)
    mR, mt = [], []
    for (i, j) in edges:
        Ti = R.Pose(jnp.asarray(gt[i][0]), jnp.asarray(gt[i][1]))
        Tj = R.Pose(jnp.asarray(gt[j][0]), jnp.asarray(gt[j][1]))
        m = Ti.inverse().compose(Tj)
        mR.append(np.asarray(m.R))
        mt.append(np.asarray(m.t))
    meas = R.Pose(jnp.asarray(np.stack(mR)), jnp.asarray(np.stack(mt)))
    poses = R.refine_pose_graph_sharded(
        R.identity_poses(n_vol), jnp.asarray([e[0] for e in edges]),
        jnp.asarray([e[1] for e in edges]), meas, mesh, iters=12,
    )
    jax.block_until_ready(poses)
    err = 0.0
    for k in range(1, n_vol):
        err = max(err, float(np.abs(np.asarray(poses.R[k]) - gt[k][0]).max()))
        err = max(err, float(np.abs(np.asarray(poses.t[k]) - gt[k][1]).max()))
    result["posegraph_err"] = err

    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
