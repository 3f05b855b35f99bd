"""Audio nearest-neighbour baseline.

The reference linear-scans every source segment per driving example on the
CPU, cosine over flattened mel patches (reference:
baselines/audio_baselines/audio_nearestneighbour.py:60-153). Here it's one
[n_driving, L] cosine matmul on the MXU, then the same frame-emission rule:
the first match emits its full window, every later one its last S frames.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _cosine_matches(driving: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    d = driving.reshape(driving.shape[0], -1)
    s = source.reshape(source.shape[0], -1)
    d = d / (jnp.linalg.norm(d, axis=1, keepdims=True) + 1e-12)
    s = s / (jnp.linalg.norm(s, axis=1, keepdims=True) + 1e-12)
    sims = d @ s.T
    # The reference initializes max_sim=0 with a strict `>` compare
    # (audio_nearestneighbour.py:103-121): when no source segment has a
    # positive cosine, it falls back to segment 0.
    return jnp.where(jnp.max(sims, axis=1) > 0, jnp.argmax(sims, axis=1), 0)


def audio_nearest_neighbour(driving_examples: np.ndarray,
                            source_examples: np.ndarray,
                            window: int, stride: int,
                            max_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per driving example, emit the best-matching segment's frames.

    Returns (frame_ids, matched_segment_ids). The first match emits its
    full window, every later one its last S frames. Matching the
    reference's loop (audio_nearestneighbour.py:102-140), emission stops
    once ``max_length`` is reached but whole blocks are kept — the output
    may overshoot by up to a block, and is never truncated. One deliberate
    divergence: the reference indexes driving examples sequentially and
    IndexErrors when the driving audio is shorter than the requested
    length (``driving_audio_eg[count]``, :105); here the driving sequence
    wraps around instead.
    """
    matches = np.asarray(_cosine_matches(jnp.asarray(driving_examples),
                                         jnp.asarray(source_examples)))
    frame_ids: list = []
    seg_ids = []
    i = 0
    while len(frame_ids) < max_length:
        seg = int(matches[i % len(matches)])
        if not frame_ids:
            frame_ids.extend(range(seg * stride, seg * stride + window))
        else:
            start = seg * stride + (window - stride)
            frame_ids.extend(range(start, seg * stride + window))
        seg_ids.append(seg)
        i += 1
    return np.asarray(frame_ids), np.asarray(seg_ids)
