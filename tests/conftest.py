"""Test configuration: run JAX on CPU with an 8-device virtual mesh.

Multi-chip sharding code paths are validated on virtual CPU devices
(`xla_force_host_platform_device_count`), per the project test strategy.
Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's sitecustomize (axon TPU plugin) overrides JAX_PLATFORMS;
# force the CPU backend explicitly for the test suite.
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_SCENES = pathlib.Path("/root/reference/sample_scenes")


@pytest.fixture
def sample_scenes():
    if not REFERENCE_SCENES.exists():
        pytest.skip("reference sample scenes unavailable")
    return REFERENCE_SCENES
