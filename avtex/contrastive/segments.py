"""Segment-index arithmetic for the contrastive pipeline.

Pure, jit-friendly functions reproducing the reference's segment geometry:

- a video of T frames is cut into overlapping windows of ``W`` frames at
  stride ``S``; segment *i* covers frames ``[i*S, i*S + W)``
  (reference: dataset/dataset.py:121-143).
- the number of *query* segments at train time is ``floor((T - W)/S) - 1``
  (the last segment is never a query); at val time ``floor((T - W)/S)``
  (reference: dataset/dataset.py:114-119).
- hard negatives are segments at offsets {-4..-1, +2..+5} from the query
  and overwrite the head of the random negative draw
  (reference: dataset/dataset.py:183-190).
"""

from __future__ import annotations

import numpy as np


def num_segments(num_frames: int, window: int, stride: int, split: str = "train") -> int:
    """Number of query segments (reference: dataset/dataset.py:114-119)."""
    n = (num_frames - window) // stride
    return n - 1 if split == "train" else n


def require_segments(num_frames: int, window: int, stride: int,
                     split: str = "val", what: str = "this video") -> int:
    """num_segments, but raise an actionable error for too-short videos.

    The reference crashes downstream with shape errors when the formula
    goes <= 0 (dataset.py:114-119 can return 0 or negative); user-facing
    avtex entry points fail loudly here instead. Synthesis needs at
    least 2 segments (a query and a distinct successor), training at
    least 1 query.
    """
    L = num_segments(num_frames, window, stride, split)
    need = 1 if split == "train" else 2
    if L < need:
        need_frames = (window + (need + (split == "train")) * stride)
        raise ValueError(
            f"{what} is too short: {num_frames} frames gives {max(L, 0)} "
            f"{split} segment(s) at window={window}, stride={stride}; "
            f"need at least {need}. Provide >= ~{need_frames} frames, or "
            f"reduce -w/-stride (fps-derived: W=ceil(fps/2), "
            f"S=ceil(fps/5)), or lower -subr subsampling.")
    return L


def segment_start_frames(num_frames: int, window: int, stride: int,
                         split: str = "val") -> np.ndarray:
    """Start frame of every segment: ``i*S`` for i in [0, L)."""
    L = num_segments(num_frames, window, stride, split)
    return np.arange(L) * stride


def segment_frame_ids(seg_id: int, window: int, stride: int) -> np.ndarray:
    """Frame ids covered by one segment: ``[i*S, i*S + W)``."""
    return np.arange(seg_id * stride, seg_id * stride + window)


def hard_negative_ids(idx: int, max_id: int) -> np.ndarray:
    """Hard-negative segment ids near the query.

    Offsets {-4,-3,-2,-1,+2,+3,+4,+5}, clipped to [0, max_id]
    (reference: dataset/dataset.py:185-189; max_id == train __len__(),
    inclusive, so the positive-of-the-last-query is reachable).
    """
    cand = np.array([idx - 4, idx - 3, idx - 2, idx - 1,
                     idx + 2, idx + 3, idx + 4, idx + 5])
    cand = cand[cand >= 0]
    return cand[cand <= max_id]


def sample_negatives(idx: int, n_total: int, n_negs: int,
                     rng: np.random.Generator) -> np.ndarray:
    """Draw negative segment ids for query ``idx`` at train time.

    Candidates are all ids in [0, n_total] (one past the last query, so the
    final segment participates as a negative) except {idx, idx+1}; ``n_negs``
    are drawn without replacement and the head of the draw is overwritten
    with the hard negatives (reference: dataset/dataset.py:131-190).
    """
    ids = np.arange(n_total + 1)
    mask = np.ones(n_total + 1, dtype=bool)
    mask[[idx, idx + 1]] = False
    candidates = ids[mask]
    negs = rng.choice(candidates, n_negs, replace=False)
    # Truncate when n_negs < 8: the reference would crash here (its negs
    # buffer is overwritten in place, dataset.py:183-190).
    hard = hard_negative_ids(idx, n_total)[:n_negs]
    negs[: len(hard)] = hard
    return negs


def target_ordering(q_id: int, L: int) -> np.ndarray:
    """Candidate ordering used at synthesis time.

    ``[pos] + all other segments in ascending order``, with q_id and pos
    removed from "others"; pos = min(q_id+1, L-1)
    (reference: validate.py:369-377).
    """
    pos_id = min(q_id + 1, L - 1)
    mask = np.ones(L, dtype=bool)
    mask[[q_id, pos_id]] = False
    others = np.arange(L)[mask]
    return np.concatenate(([pos_id], others))


def gather_windows(frames: np.ndarray, window: int, stride: int,
                   split: str = "val") -> np.ndarray:
    """Materialize all segment windows: [L, W, ...frame dims...].

    Host-side helper for the embed-once pass; uses stride tricks to avoid a
    copy until the device transfer.
    """
    L = num_segments(len(frames), window, stride, split)
    s0 = frames.strides[0]
    shape = (L, window) + frames.shape[1:]
    strides = (s0 * stride, s0) + frames.strides[1:]
    return np.lib.stride_tricks.as_strided(frames, shape=shape, strides=strides)
