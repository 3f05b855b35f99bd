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
    # Namespace per host ISA: XLA:CPU cache entries bake in the compile
    # machine's features, this filesystem migrates between physical
    # hosts, and XLA only WARNS on mismatch (SIGILL risk). TPU entries
    # are keyed by device kind already, but host-compiled wrappers ride
    # the same dir — cheap to segregate unconditionally.
    from avtex.utils.aot import _host_cpu_fingerprint
    cache_dir = os.path.join(cache_dir, _host_cpu_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache_dir
