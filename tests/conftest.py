"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's test strategy — mesh/sharding tests use XLA's host
device emulation so the 8-way segment sharding is exercised without TPU
hardware.

This environment's sitecustomize force-registers a remote 'axon' TPU
backend and sets ``jax_platforms`` through jax.config (overriding the env
var), so forcing CPU takes two steps: set XLA_FLAGS before jax initializes,
then override the *config* value back to cpu.
"""

import os
import tempfile

# Keep test-compiled AOT executables (avtex/utils/aot.py) out of the
# user's cache: 8-virtual-device CPU programs are useless elsewhere.
os.environ.setdefault("AVTEX_AOT_CACHE",
                      tempfile.mkdtemp(prefix="avtex_aot_test_"))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
