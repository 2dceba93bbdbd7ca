"""Test harness setup: force JAX onto CPU with 8 virtual devices so the
tensor-parallel / mesh paths run in CI without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere in the test process.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest


@pytest.fixture
def tmp_model_dir(tmp_path):
    """A directory that passes Config.validate's model_path check."""
    return str(tmp_path)
