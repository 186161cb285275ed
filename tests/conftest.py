"""Test config: force a virtual 8-device CPU platform before JAX loads.

Multi-chip sharding tests run on ``xla_force_host_platform_device_count=8``
virtual CPU devices, per the driver's dry-run contract; real-TPU behavior is
exercised by bench.py instead.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_dir() -> pathlib.Path:
    return GOLDEN
