"""Persistent XLA compilation cache.

SlowFast-sized programs take minutes to compile through a remote-attached
TPU; caching the serialized executables makes every run after the first
start in seconds. Called by bench.py and the CLIs.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "AVTEX_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "avtex", "xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache_dir
