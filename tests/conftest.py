"""Test configuration: run everything on a virtual 8-device CPU mesh.

The TPU chip (axon) is reserved for benches; tests must be hermetic and
exercise multi-device sharding, so we force the CPU backend with 8 virtual
devices (SURVEY.md §4 item f).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
