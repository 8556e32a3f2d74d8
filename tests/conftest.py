"""Test configuration: force JAX onto a virtual multi-device CPU platform.

Sharding tests need several devices; real runs target TPU, but tests run
anywhere by splitting the host CPU into 8 virtual XLA devices.

NOTE: merely setting JAX_PLATFORMS=cpu in the environment is not enough on
hosts where a TPU plugin site-hook (e.g. axon) registers itself and forces
the TPU platform; ``jax.config.update("jax_platforms", ...)`` after import
wins, so do both.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# the f64 solve path needs x64
jax.config.update("jax_enable_x64", True)

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures() -> pathlib.Path:
    return FIXTURES


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running accuracy sweeps")
