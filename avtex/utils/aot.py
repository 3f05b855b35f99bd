"""AOT executable persistence for programs the XLA cache won't serve.

The persistent compilation cache (avtex.utils.cache) never serves the
``lax.scan`` walk program on this backend (NOTES_r2 "deferred"), so every
fresh process used to pay the walk's full compile. Measured on the remote
TPU (tools/walk_aot_probe.py, 2026-08 round 3):
``jax.experimental.serialize_executable`` closes the hole —
serialize ≈ 0.9 MB, fresh-process ``deserialize_and_load`` 0.12 s, first
call 0.05 s (no compile), outputs identical to the in-process executable.

``cached_compile`` is a tiny keyed store around that mechanism:

  exe = cached_compile(key, lambda: jit_fn.lower(*args).compile())
  out = exe(*args)

Keys are namespaced by backend platform, device kind, device count and
jax version — plus, on CPU backends, a host ISA fingerprint: XLA:CPU AOT
results bake in the compile machine's features and only WARN on mismatch
(SIGILL risk), and this filesystem migrates between physical hosts. A
payload from a different topology/host misses or fails to load, and any
load error falls back (with a warning) to a fresh compile that
overwrites the stale entry. Entries live under ``~/.cache/avtex/aot`` (override with
``AVTEX_AOT_CACHE``; set it empty to disable persistence entirely).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys
import tempfile
from typing import Any, Callable, Dict, Tuple

_MEMO: Dict[Tuple[str, str], Any] = {}


def _cache_dir() -> str | None:
    d = os.environ.get(
        "AVTEX_AOT_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "avtex", "aot"))
    return d or None


def _host_cpu_fingerprint() -> str:
    """Hash of the host CPU's ISA feature set (Linux /proc/cpuinfo).

    XLA:CPU AOT executables bake in the compile machine's features; this
    filesystem can migrate between physical hosts, and loading an
    executable compiled for a different feature set risks SIGILL (the
    loader only warns). Keying on the feature flags turns a foreign-host
    entry into a cache miss instead.
    """
    import platform as _platform

    flags = "no-cpuinfo"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:12]
                    break
    except OSError:
        pass
    return f"{_platform.machine()}-{flags}"


def _backend_tag() -> str:
    import jax

    dev = jax.devices()[0]
    tag = (f"{dev.platform}-{dev.device_kind}-{len(jax.devices())}"
           f"-{jax.__version__}")
    if dev.platform == "cpu":
        tag += f"-{_host_cpu_fingerprint()}"
    return tag


def _entry_path(cache_dir: str, key: str, tag: str) -> str:
    h = hashlib.sha256(f"{tag}|{key}".encode()).hexdigest()[:24]
    return os.path.join(cache_dir, f"{h}.aotexe")


def cached_compile(key: str, build: Callable[[], Any]):
    """Return a loaded executable for ``key``, from (in order): the
    in-process memo, the on-disk store, or ``build()`` (persisting the
    result). ``build`` must return a ``jax.stages.Compiled``.
    """
    from jax.experimental import serialize_executable

    tag = _backend_tag()
    memo_key = (tag, key)
    if memo_key in _MEMO:
        return _MEMO[memo_key]

    cache_dir = _cache_dir()
    path = _entry_path(cache_dir, key, tag) if cache_dir else None

    if path and os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload = pickle.loads(f.read())
            exe = serialize_executable.deserialize_and_load(*payload)
            _MEMO[memo_key] = exe
            return exe
        except Exception as e:  # stale/foreign entry: recompile below
            print(f"[avtex.aot] WARNING: cached executable load failed for "
                  f"{key!r} ({type(e).__name__}: {e}); recompiling",
                  file=sys.stderr, flush=True)

    exe = build()
    _MEMO[memo_key] = exe
    if path:
        try:
            payload = serialize_executable.serialize(exe)
            os.makedirs(cache_dir, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(pickle.dumps(payload))
            os.replace(tmp, path)
        except Exception as e:  # persistence is best-effort
            print(f"[avtex.aot] WARNING: failed to persist executable for "
                  f"{key!r} ({type(e).__name__}: {e}); next process will "
                  f"recompile", file=sys.stderr, flush=True)
    return exe
