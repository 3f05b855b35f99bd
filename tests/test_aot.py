"""AOT executable persistence (avtex/utils/aot.py).

The persistent XLA cache does not serve lax.scan programs on the remote
backend (NOTES_r2), so the device walk's compiled executable is persisted
explicitly via jax.experimental.serialize_executable. These tests pin the
mechanism (fresh-process disk load, no recompile) and the integration
(AOT walk == plain jit walk).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

from avtex.utils.aot import cached_compile

def build():
    if os.environ["AOT_EXPECT"] == "hit":
        raise AssertionError("cache miss: build() called on second run")
    def f(x, y):
        def step(c, i):
            c = c @ y + i
            return c, c.sum()
        return jax.lax.scan(step, x, jnp.arange(8, dtype=x.dtype))[1]
    x = jnp.ones((16, 16), jnp.float32)
    return jax.jit(f).lower(x, x * 0.5).compile()

exe = cached_compile("test-scan-v1", build)
x = jnp.full((16, 16), 2.0, jnp.float32)
out = np.asarray(exe(x, x * 0.25))
print("OUT", out.sum())
"""


@pytest.mark.slow
def test_cached_compile_serves_fresh_process(tmp_path):
    """Run the same keyed program in two fresh processes: the second must
    load from disk (its build() raises on call) and match the first."""
    env = dict(os.environ)
    # Single-device children (the deployment case): drop the 8-virtual-
    # device flag the test env sets, or the serialized device assignment
    # would straddle two client topologies.
    env.update(PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu", XLA_FLAGS="",
               PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
               AVTEX_AOT_CACHE=str(tmp_path))
    outs = []
    for expect in ("miss", "hit"):
        env["AOT_EXPECT"] = expect
        proc = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                              capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr[-2000:]
        outs.append(proc.stdout.strip().splitlines()[-1])
    assert outs[0] == outs[1] and outs[0].startswith("OUT")
    assert any(p.endswith(".aotexe") for p in os.listdir(tmp_path))


def test_device_walk_aot_matches_plain(tmp_path, monkeypatch):
    """synthesize_indices via the AOT-cached executable returns exactly
    the plain jit path's result (same program, same rng)."""
    from avtex.synth.engine import synthesize_indices
    from avtex.utils import aot

    monkeypatch.setattr(aot, "_MEMO", {})  # earlier walk tests share the
    # same shape bucket; a memo hit would skip the disk write under test
    g = np.random.default_rng(3)
    q = np.asarray(g.random((40, 16)), np.float32)
    t = np.asarray(g.random((40, 16)), np.float32)

    monkeypatch.setenv("AVTEX_AOT_CACHE", str(tmp_path))
    monkeypatch.setenv("AVTEX_WALK_AOT", "1")
    aot = synthesize_indices(q, t, 30, temp=0.5, threshold=0.4, seed_id=3)
    monkeypatch.setenv("AVTEX_WALK_AOT", "0")
    plain = synthesize_indices(q, t, 30, temp=0.5, threshold=0.4, seed_id=3)

    np.testing.assert_array_equal(aot.indices, plain.indices)
    np.testing.assert_array_equal(aot.nonzero_counts, plain.nonzero_counts)
    np.testing.assert_allclose(aot.pos_prob, plain.pos_prob, rtol=1e-6)
    assert any(p.endswith(".aotexe") for p in os.listdir(tmp_path))


def test_backend_tag_fingerprints_host_cpu(monkeypatch):
    """On CPU backends the cache tag must include the host ISA feature
    set: XLA:CPU AOT executables bake in machine features and only warn
    on mismatch (SIGILL risk), and this filesystem migrates between
    physical hosts."""
    from avtex.utils import aot

    fp = aot._host_cpu_fingerprint()
    tag = aot._backend_tag()
    assert fp in tag and "cpu" in tag

    # a different feature set must change the fingerprint (hence the key)
    monkeypatch.setattr(
        aot, "_host_cpu_fingerprint", lambda: "x86_64-deadbeef")
    assert aot._backend_tag() != tag
