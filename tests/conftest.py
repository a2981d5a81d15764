"""Test configuration: force an 8-device virtual CPU mesh before JAX init
so multi-chip sharding paths are exercised without TPU hardware.

Note: this image's sitecustomize registers a remote TPU backend and forces
``jax_platforms`` via jax.config at interpreter start, so the env var alone
is not enough — the config must be re-set to cpu after importing jax and
before any computation runs.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def key():
    return jax.random.key(0)
