"""Test config: force a virtual 8-device CPU platform.

Multi-chip sharding tests run on ``xla_force_host_platform_device_count=8``
virtual CPU devices, per the driver's dry-run contract; real-TPU behavior is
exercised by bench.py instead.

NOTE: this environment force-registers a remote 'axon' TPU backend from
sitecustomize and programmatically selects it, so the JAX_PLATFORMS env var
alone is NOT enough — the platform must be overridden via jax.config after
import (before first backend use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# shrink the Pallas row block: interpret mode simulates every lane, so the
# production 2048 would cost ~8x the work for the same coverage — and a
# small block makes the multi-chunk batch paths actually chunk in tests
os.environ.setdefault("FPMASH_ROW_BLOCK", "256")

import jax

jax.config.update("jax_platforms", "cpu")
# Tests are XLA-CPU compile-dominated (every factorization family traces
# its own kernels); skipping most optimization passes roughly halves the
# suite wall clock.  Semantics-preserving: all kernels are integer/exact,
# and the golden-parity assertions would catch any deviation.
jax.config.update("jax_disable_most_optimizations", True)

import pathlib

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_dir() -> pathlib.Path:
    return GOLDEN
