"""ctypes binding for the C++ AVI muxer (see muxer.cc)."""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

from . import load


def available() -> bool:
    lib = load()
    return lib is not None and hasattr(lib, "avtex_write_avi")


def write_avi(path: str, jpegs: List[bytes], width: int, height: int,
              fps: float, pcm: Optional[np.ndarray], sample_rate: int) -> str:
    """Write an interleaved MJPEG+PCM AVI via the native muxer."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library not available")
    lib.avtex_write_avi.restype = ctypes.c_int
    lib.avtex_write_avi.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
    ]

    n = len(jpegs)
    buf_ptrs = (ctypes.c_char_p * n)(*jpegs)
    sizes = (ctypes.c_int32 * n)(*[len(j) for j in jpegs])

    if pcm is not None:
        pcm = np.ascontiguousarray(pcm, dtype=np.int16)
        if pcm.ndim == 1:
            pcm = pcm[:, None]
        pcm_ptr = pcm.ctypes.data_as(ctypes.c_void_p)
        n_samples, channels = pcm.shape
    else:
        pcm_ptr, n_samples, channels = None, 0, 0

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    rc = lib.avtex_write_avi(
        path.encode(), buf_ptrs, sizes, n, width, height, float(fps),
        pcm_ptr, n_samples, channels, int(sample_rate))
    if rc != 0:
        raise RuntimeError(f"avtex_write_avi failed with code {rc}")
    return path
