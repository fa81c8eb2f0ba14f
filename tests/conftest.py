"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set env before the first jax import anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# jax >= 0.8 ignores the XLA_FLAGS spelling; the config knobs are
# authoritative (both must be set for the device cache to refresh).
if jax.config.jax_num_cpu_devices < 8:
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

EXAMPLE_DIR = pathlib.Path("/root/reference/example")


@pytest.fixture(scope="session")
def example_dir():
    if not EXAMPLE_DIR.exists():
        pytest.skip("reference example data not available")
    return EXAMPLE_DIR
