"""Farneback optical-flow features.

Parity with the reference's standalone dump script
(reference: contrastive_video_textures/utils/flow_features.py:1-32, which
hardcodes a path and is never imported) — exposed here as a reusable
function instead.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def farneback_flow(frames: np.ndarray, pyr_scale: float = 0.5,
                   levels: int = 3, winsize: int = 15,
                   iterations: int = 3) -> np.ndarray:
    """Dense optical flow between consecutive frames.

    Args:
      frames: uint8 [T, H, W, 3] RGB.

    Returns:
      float32 [T-1, H, W, 2] (dx, dy) flow fields.
    """
    import cv2
    frames = np.asarray(frames)
    grays = [cv2.cvtColor(f[:, :, ::-1], cv2.COLOR_BGR2GRAY) for f in frames]
    out = []
    for a, b in zip(grays[:-1], grays[1:]):
        flow = cv2.calcOpticalFlowFarneback(
            a, b, None, pyr_scale, levels, winsize, iterations, 5, 1.2, 0)
        out.append(flow)
    return np.stack(out).astype(np.float32)


def flow_magnitude_features(frames: np.ndarray,
                            window: Optional[int] = None) -> np.ndarray:
    """Per-frame mean flow magnitude (cheap motion descriptor)."""
    flow = farneback_flow(frames)
    mag = np.linalg.norm(flow, axis=-1).mean(axis=(1, 2))
    return np.concatenate([[mag[0]], mag])  # pad first frame
