"""Packaging contract: pyproject metadata and console entry points.

The reference repo is run-from-checkout only (no setup.py); avtex ships
as an installable package — pin that the declared entry points resolve
to real callables and the version stays in sync with avtex.__version__.
"""

import os
import sys
import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_version_in_sync():
    import avtex

    assert _pyproject()["project"]["version"] == avtex.__version__


def test_console_scripts_resolve():
    import importlib

    scripts = _pyproject()["project"]["scripts"]
    assert set(scripts) == {"avtex", "avtex-classic", "avtex-baselines"}
    for target in scripts.values():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        assert callable(fn)


def test_package_dirs_all_declared():
    """Every avtex subpackage on disk is importable (caught by find:
    include avtex*), and the native sources ship as package data."""
    pkg_data = _pyproject()["tool"]["setuptools"]["package-data"]
    assert "*.cc" in pkg_data["avtex.native"]
    assert "Makefile" in pkg_data["avtex.native"]
    for entry in sorted(os.listdir(os.path.join(REPO, "avtex"))):
        path = os.path.join(REPO, "avtex", entry)
        if os.path.isdir(path) and not entry.startswith("__"):
            assert os.path.exists(os.path.join(path, "__init__.py")), entry


def test_torch_is_optional_dependency():
    """torch must only be required by the convert extra — the core
    runtime (models, synthesis, training) must not import it at module
    scope. Checked in a child interpreter (the suite itself imports
    torch for the reference-parity tests)."""
    deps = _pyproject()["project"]["dependencies"]
    assert not any(d.startswith("torch") for d in deps)
    extras = _pyproject()["project"]["optional-dependencies"]
    assert any(d.startswith("torch") for d in extras["convert"])

    import subprocess

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import avtex.config, avtex.contrastive.model, avtex.synth,"
        " avtex.train.loop, avtex.classic, avtex.baselines,"
        " avtex.parallel, avtex.cli.main, avtex.utils.convert\n"
        "import sys; assert 'torch' not in sys.modules, 'torch leaked'\n"
    )
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO,
                   env=env, timeout=300)
