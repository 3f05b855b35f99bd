"""avtex native runtime (C++, ctypes-bound).

Build with ``make -C avtex/native`` (g++, no external deps). Every consumer
has a pure-Python fallback, so the framework works unbuilt; the native path
removes per-frame Python overhead from the host side of synthesis.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libavtex_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True,
                       timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:  # noqa: BLE001
        return False


def load(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building on first use if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_LIB_PATH) and (not auto_build or not _build()):
        return None
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    return _lib


def available() -> bool:
    return load() is not None
