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
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
