import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware; single-chip numerics are identical.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process, large volumes)"
    )

from sift3d_tpu.oracle import cpu_sift, fixtures  # noqa: E402


@pytest.fixture(scope="session")
def rand32():
    """Small smooth random volume with a decent keypoint population."""
    return fixtures.smooth_random_volume((32, 32, 32), seed=7, smooth=2)


@pytest.fixture(scope="session")
def rand40():
    return fixtures.smooth_random_volume((40, 36, 44), seed=3, smooth=2)


@pytest.fixture(scope="session")
def oracle32(rand32):
    return cpu_sift.run_sift(rand32)


@pytest.fixture(scope="session")
def oracle40(rand40):
    return cpu_sift.run_sift(rand40)
