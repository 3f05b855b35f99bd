"""The examples/ scripts must actually run (subprocess, CPU).

Marked slow: each example compiles its own models in a child process.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(name, extra_env=None, timeout=900):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               MPLBACKEND="Agg", **(extra_env or {}))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"{name} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    return proc.stdout


@pytest.mark.slow
def test_quickstart_example():
    out = _run_example("quickstart.py")
    assert "epoch losses" in out and "walk over segments" in out


@pytest.mark.slow
def test_serve_example():
    out = _run_example("serve.py")
    assert "deterministic replay OK" in out


@pytest.mark.slow
def test_classic_example():
    out = _run_example("classic.py")
    assert "fused transition matrix" in out


@pytest.mark.slow
def test_sharded_embed_example():
    out = _run_example(
        "sharded_embed.py",
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    assert "matches the unsharded embed" in out


@pytest.mark.slow
def test_audio_driven_example():
    out = _run_example("audio_driven.py")
    assert "epoch losses" in out and "audio-driven walk" in out
