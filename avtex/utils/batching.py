"""Chunking machinery for scoring long videos on fixed memory.

API parity with the reference's batching utils (reference:
utils/utils.py:192-260): pad-split a [1, N, ...] tensor into fixed batches,
split a flat frame array into overlapping chunks that each yield
``max_segments`` windows, and re-combine per-device outputs.

In avtex's embed-once design this machinery mostly *disappears*
(SURVEY.md §2.5 item 2) — the segment axis is batched by
avtex.synth.embeddings and sharded by avtex.parallel — but the functions
are provided (numpy, zero-copy where possible) for users porting reference
workflows.

Note: the reference's chunk start ``idx * S * (max_segments - 1)`` yields
chunks that *overlap by one segment* (its models re-slice mbs windows per
chunk, so consecutive chunks share a window); reproduced exactly.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np


def split_into_batches(x: np.ndarray, max_segments: int
                       ) -> Tuple[np.ndarray, int]:
    """[1, N, ...] -> ([ceil(N/m), m, ...] zero-padded, N)."""
    assert x.shape[0] == 1
    n = x.shape[1]
    num_batches = math.ceil(n / max_segments)
    out = np.zeros((num_batches, max_segments) + x.shape[2:], dtype=x.dtype)
    for idx in range(num_batches):
        start = idx * max_segments
        end = min(start + max_segments, n)
        out[idx, : end - start] = x[0, start:end]
    return out, n


def split_into_overlapping_segments(x: np.ndarray, max_segments: int,
                                    window: int, stride: int
                                    ) -> Tuple[np.ndarray, int]:
    """[N, ...] frames -> ([B, m*S + W, ...] overlapping chunks, N)."""
    n = x.shape[0]
    total_segments = math.ceil((n - window) / stride)
    chunk = max_segments * stride + window
    batches = math.ceil(total_segments / max_segments)
    out = np.zeros((batches, chunk) + x.shape[1:], dtype=x.dtype)
    for idx in range(batches):
        start = idx * stride * (max_segments - 1)
        end = min(start + chunk, n)
        out[idx, : end - start] = x[start:end]
    return out, n


def batched_apply(fn, *arrays: np.ndarray, batch_size: int):
    """Run a fixed-batch jitted fn over the leading axis of host arrays.

    Pads the tail batch by repeating the last row (keeps one compiled
    shape), trims the padding from the result. All arrays share the
    leading dim; returns the concatenated device output.
    """
    import jax.numpy as jnp

    n = len(arrays[0])
    out = []
    for b0 in range(0, n, batch_size):
        chunks = [np.asarray(a[b0:b0 + batch_size]) for a in arrays]
        pad = batch_size - len(chunks[0])
        if pad:
            chunks = [np.concatenate([c, np.repeat(c[-1:], pad, 0)])
                      for c in chunks]
        res = fn(*[jnp.asarray(c) for c in chunks])
        out.append(res[:batch_size - pad] if pad else res)
    return jnp.concatenate(out, axis=0)


def combine_batches(x: np.ndarray, num_valid: int) -> np.ndarray:
    """[G, N/G, ...] -> [1, num_valid, ...] (inverse of split_into_batches)."""
    g, per = x.shape[:2]
    assert num_valid <= g * per
    return x.reshape((1, g * per) + x.shape[2:])[:, :num_valid]
