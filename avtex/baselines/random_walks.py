"""Random playback baselines.

- ``random_sequential_walk``: random start segment, then *sequential*
  playback wrapping at the end — the reference's misnamed "random baseline"
  (reference: baselines/audio_baselines/random_baseline.py:56-105).
- ``random_segment_walk``: independently random segment every step
  ("Random Clip", reference: random_segment_baseline.py:55-102).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def random_sequential_walk(num_segments: int, window: int, stride: int,
                           max_length: int, seed: int = 0) -> np.ndarray:
    """Frame ids: random start, sequential segments, wrap at the end."""
    rng = np.random.default_rng(seed)
    seg = int(rng.integers(num_segments))
    frame_ids = list(range(seg * stride, seg * stride + window))
    while len(frame_ids) < max_length:
        seg = (seg + 1) % num_segments
        start = seg * stride + (window - stride)
        frame_ids.extend(range(start, seg * stride + window))
    return np.asarray(frame_ids[:max_length])


def random_segment_walk(num_segments: int, window: int, stride: int,
                        max_length: int, seed: int = 0
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Frame ids + segment ids: fresh uniform segment per step."""
    rng = np.random.default_rng(seed)
    frame_ids: list = []
    segs: list = []
    first = True
    while len(frame_ids) < max_length:
        seg = int(rng.integers(num_segments))
        segs.append(seg)
        if first:
            frame_ids.extend(range(seg * stride, seg * stride + window))
            first = False
        else:
            start = seg * stride + (window - stride)
            frame_ids.extend(range(start, seg * stride + window))
    return np.asarray(frame_ids[:max_length]), np.asarray(segs)
