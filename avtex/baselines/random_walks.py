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
    """Frame ids: random start, sequential segments, wrap at the end.

    Like the reference loop (random_baseline.py:63-69), whole blocks are
    emitted until ``max_length`` is reached — the output may overshoot by
    up to a block and is never truncated.
    """
    rng = np.random.default_rng(seed)
    seg = int(rng.integers(num_segments))
    frame_ids = list(range(seg * stride, seg * stride + window))
    while len(frame_ids) < max_length:
        seg = (seg + 1) % num_segments
        start = seg * stride + (window - stride)
        frame_ids.extend(range(start, seg * stride + window))
    return np.asarray(frame_ids)


def random_segment_walk(num_segments: int, window: int, stride: int,
                        max_length: int, seed: int = 0
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Frame ids + segment ids: fresh uniform segment per step.

    Whole blocks are kept past ``max_length`` (no truncation), matching
    the reference loop (random_segment_baseline.py:63-66).
    """
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
    return np.asarray(frame_ids), np.asarray(segs)
