"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's test strategy — mesh/sharding tests use XLA's host
device emulation so the 8-way segment sharding is exercised without TPU
hardware. Must set env before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
