"""ctypes binding for the C++ frame stitcher (see framestitch.cc),
with numpy fallbacks carrying the same semantics."""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from . import load


def stitch_frames(video: np.ndarray, frame_ids: np.ndarray,
                  frames_bar: bool = False,
                  total_input_frames: Optional[int] = None) -> np.ndarray:
    """Gather ``video[frame_ids]`` (+ optional red position bar).

    Reference semantics: bar occupies rows [H-25, H-10) with a red 6-px
    marker at column ``id * W / total_input_frames``
    (reference: validate.py:625-631, video_textures.py:216-221).
    """
    video = np.ascontiguousarray(video, dtype=np.uint8)
    frame_ids = np.ascontiguousarray(frame_ids, dtype=np.int64)
    t, h, w, _ = video.shape
    total = total_input_frames if total_input_frames is not None else t
    out = np.empty((len(frame_ids), h, w, 3), dtype=np.uint8)

    lib = load()
    if lib is not None and hasattr(lib, "avtex_stitch_frames"):
        rc = lib.avtex_stitch_frames(
            video.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(t), ctypes.c_int64(h), ctypes.c_int64(w),
            frame_ids.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(len(frame_ids)),
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int32(1 if frames_bar else 0),
            ctypes.c_int64(total))
        if rc == 0:
            return out
    # numpy fallback
    out[:] = video[frame_ids]
    if frames_bar and h > 25:
        for i, fid in enumerate(frame_ids):
            col = int(fid * w / total) if total else 0
            out[i, h - 25:h - 10, :, :] = 0
            out[i, h - 25:h - 10, max(0, col - 3):min(w, col + 3)] = [255, 0, 0]
    return out


def crossfade(frame0: np.ndarray, frame1: np.ndarray, n_mid: int) -> np.ndarray:
    """``n_mid`` linear blends between two uint8 frames (SuperSloMo fallback)."""
    f0 = np.ascontiguousarray(frame0, dtype=np.uint8)
    f1 = np.ascontiguousarray(frame1, dtype=np.uint8)
    h, w, _ = f0.shape
    out = np.empty((n_mid, h, w, 3), dtype=np.uint8)
    lib = load()
    if lib is not None and hasattr(lib, "avtex_crossfade"):
        rc = lib.avtex_crossfade(
            f0.ctypes.data_as(ctypes.c_void_p),
            f1.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(h), ctypes.c_int64(w), ctypes.c_int32(n_mid),
            out.ctypes.data_as(ctypes.c_void_p))
        if rc == 0:
            return out
    t = (np.arange(1, n_mid + 1, dtype=np.float32) / (n_mid + 1))[:, None, None, None]
    blend = f0[None].astype(np.float32) + t * (f1[None].astype(np.float32)
                                               - f0[None].astype(np.float32))
    out[:] = (blend + 0.5).astype(np.uint8)
    return out
