"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This gives every test run deterministic multi-device semantics without TPU
hardware (the capability the reference's DDP stack lacks — SURVEY.md §4).
The axon site hook pins JAX_PLATFORMS=axon via sitecustomize, so the env var
alone is not enough — we must update jax.config before any backend init.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
    assert jax.device_count() == 8
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
