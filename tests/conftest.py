"""Test harness setup: force JAX onto CPU with 8 virtual devices so the
tensor-parallel / mesh paths run in CI without TPU hardware (SURVEY §4).

Note: the environment may preset JAX_PLATFORMS (e.g. to a TPU plugin) and a
sitecustomize may import jax before pytest starts, so plain env vars are too
late — use jax.config.update, which works any time before backend init.
"""

import os

# Belt and braces for subprocesses spawned by tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest


@pytest.fixture(autouse=True, scope="session")
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.devices()}"
    )
    assert jax.device_count() == 8


@pytest.fixture
def tmp_model_dir(tmp_path):
    """A directory that passes Config.validate's model_path check."""
    return str(tmp_path)
