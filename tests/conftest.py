"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware (the JAX-idiomatic
fake backend for data-parallel tests).

Note: this environment's sitecustomize imports jax at interpreter startup to
register the TPU plugin, so JAX_PLATFORMS env tweaks are too late here — the
platform must be switched via jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full-suite mode; ~25 min on 1 CPU)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(111)
