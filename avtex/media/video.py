"""Video decode/encode on the host (OpenCV backend).

The reference decodes the *entire* video into RAM with torchvision.io
(reference: dataset/dataset.py:41, validate.py:79) and re-encodes PNG frame
dirs through an ffmpeg subprocess (reference: utils/utils.py:43-189). Here
decode yields a contiguous uint8 RGB array ready for one H2D transfer, and
encode goes straight through OpenCV's VideoWriter — no PNG round-trip, no
subprocess.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

try:  # pragma: no cover - exercised implicitly everywhere
    import cv2
except Exception:  # noqa: BLE001 - optional in pure-compute environments
    cv2 = None


def _require_cv2():
    if cv2 is None:
        raise RuntimeError("OpenCV is required for video I/O but is not available")


def video_fps(path: str) -> float:
    """Container frame rate (reference derives W/S from this — main.py:511-516)."""
    _require_cv2()
    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            raise FileNotFoundError(path)
        return float(cap.get(cv2.CAP_PROP_FPS))
    finally:
        cap.release()


def read_video(path: str, subsample_rate: int = 1,
               max_frames: Optional[int] = None) -> Tuple[np.ndarray, float]:
    """Decode a video file.

    Args:
      path: video file.
      subsample_rate: keep every k-th frame (reference: main.py:78-84,
        validate.py:111-113).
      max_frames: optional cap on decoded (pre-subsample) frames.

    Returns:
      (frames, fps): frames is uint8 RGB [T, H, W, 3]; fps is the container
      rate (of the *original* stream, not divided by subsample_rate, matching
      the reference's usage).
    """
    _require_cv2()
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(path)
    fps = float(cap.get(cv2.CAP_PROP_FPS))
    frames = []
    i = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if max_frames is not None and i >= max_frames:
                break
            if i % subsample_rate == 0:
                frames.append(frame[:, :, ::-1])  # BGR -> RGB
            i += 1
    finally:
        cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.ascontiguousarray(np.stack(frames)), fps


def write_video(frames: np.ndarray, path: str, fps: float,
                fourcc: str = "mp4v") -> str:
    """Encode uint8 RGB [T, H, W, 3] frames to a video file."""
    _require_cv2()
    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = np.clip(frames, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    h, w = frames.shape[1:3]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc), fps, (w, h))
    if not writer.isOpened():
        raise RuntimeError(f"VideoWriter failed to open {path}")
    try:
        for f in frames:
            writer.write(np.ascontiguousarray(f[:, :, ::-1]))  # RGB -> BGR
    finally:
        writer.release()
    return path


def write_frames_png(frames: np.ndarray, folder: str, start: int = 0) -> str:
    """Dump frames as zero-padded PNGs (reference: validate.py:711-730)."""
    _require_cv2()
    os.makedirs(folder, exist_ok=True)
    for i, f in enumerate(np.asarray(frames)):
        cv2.imwrite(os.path.join(folder, f"{start + i:06d}.png"),
                    np.ascontiguousarray(f[:, :, ::-1]))
    return folder
