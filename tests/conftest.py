"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count), mirroring how the reference tests
SP on multi-GPU-single-host (SURVEY.md §4 implication).
"""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (e.g. the axon TPU tunnel):
# tests validate logic + sharding on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# A pytest plugin may import jax before this conftest runs, capturing the
# ambient JAX_PLATFORMS (the axon TPU tunnel); override via jax.config,
# which works as long as the backend hasn't been initialized yet.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-wall tests")


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices()
