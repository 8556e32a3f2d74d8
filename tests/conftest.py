"""Test configuration: force JAX onto a virtual multi-device CPU platform.

Sharding tests need several devices; real runs target TPU, but tests run
anywhere by splitting the host CPU into 8 virtual XLA devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# the solve path needs float64
os.environ.setdefault("JAX_ENABLE_X64", "1")

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures() -> pathlib.Path:
    return FIXTURES


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running accuracy sweeps")
