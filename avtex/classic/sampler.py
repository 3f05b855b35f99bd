"""Random-walk texture sampling over a transition matrix.

The reference walks the thresholded matrix one transition at a time with
``np.random.choice(P[this].nonzero())`` — i.e. *uniform* over surviving
columns (reference: baselines/classic_video_textures/video_textures.py:76-78)
— with three stitching modes: per-frame (-m 1), per-stride block (-m 2) and
per-filter-window block (-m 3) (reference: video_textures.py:48-209).

Two implementations:
- ``sample_texture_walk``: a single ``lax.scan`` on device; uniform choice
  over the nonzero mask via masked exponential race (Gumbel trick). The whole
  walk compiles to one kernel; frames are stitched on the host afterwards.
- ``sample_texture_walk_host``: numpy mirror driven by a
  ``np.random.Generator`` for exact index-semantics parity tests.
"""

from __future__ import annotations

from typing import Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_steps",))
def _walk_scan(p: jnp.ndarray, start: jnp.ndarray, rng: jax.Array,
               num_steps: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mask = p > 0.0

    def step(carry, key):
        cur = carry
        row = mask[cur]
        # Uniform over nonzero columns: argmax of uniform noise on the mask.
        noise = jax.random.uniform(key, (p.shape[1],))
        nxt = jnp.argmax(jnp.where(row, noise, -1.0))
        jump = nxt != cur + 1
        return nxt, (nxt, jump)

    keys = jax.random.split(rng, num_steps)
    _, (idx, jumps) = jax.lax.scan(step, start, keys)
    return jnp.concatenate([start[None], idx]), jumps


def sample_texture_walk(p: jnp.ndarray, start: int, num_steps: int,
                        rng: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device random walk.

    Shape-bucketed (N to multiples of 128, steps to multiples of 64) and
    served through AOT executable persistence (avtex/utils/aot.py) — the
    persistent XLA cache never serves lax.scan programs on this backend,
    so fresh processes otherwise pay the full walk compile (the same hole
    avtex/synth/engine.py closes for the contrastive walk). Padded rows
    are never visited (all-zero columns are never chosen), so bucketing
    preserves walk validity; the sampled stream differs across bucket
    sizes (noise vector length changes), which is distribution-neutral.

    Args:
      p: [N, N] transition matrix (zeros = forbidden transitions).
      start: initial frame/segment index.
      num_steps: number of transitions to sample.
      rng: jax PRNG key.

    Returns:
      (indices [num_steps+1], jump_flags [num_steps]) — jump when the chosen
      next index differs from current+1.
    """
    import os

    p = jnp.asarray(p)
    n_pad = (-p.shape[0]) % 128
    if n_pad:
        p = jnp.pad(p, ((0, n_pad), (0, n_pad)))
    steps_pad = -(-num_steps // 64) * 64
    dyn = (p, jnp.asarray(start, jnp.int32), rng)
    if os.environ.get("AVTEX_WALK_AOT", "1") == "1":
        from avtex.utils.aot import cached_compile
        key = f"classic-walk-v1-N{p.shape[0]}-steps{steps_pad}-{p.dtype}"
        try:
            exe = cached_compile(
                key,
                lambda: jax.jit(_walk_scan, static_argnames=("num_steps",))
                .lower(*dyn, num_steps=steps_pad).compile())
            idx, jumps = exe(*dyn)
        except Exception:
            idx, jumps = _walk_scan(*dyn, num_steps=steps_pad)
    else:
        idx, jumps = _walk_scan(*dyn, num_steps=steps_pad)
    return idx[:num_steps + 1], jumps[:num_steps]


def sample_texture_walk_host(p: np.ndarray, start: int, num_steps: int,
                             rng: np.random.Generator
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy mirror of the reference walk (uniform over nonzero columns)."""
    cur = start
    idx = [start]
    jumps = []
    for _ in range(num_steps):
        choices = np.flatnonzero(p[cur])
        nxt = int(rng.choice(choices))
        jumps.append(nxt != cur + 1)
        idx.append(nxt)
        cur = nxt
    return np.asarray(idx), np.asarray(jumps)


def expand_walk_to_frames(indices: np.ndarray, mode: int, stride: int,
                          filter_size: int, num_frames: int) -> np.ndarray:
    """Expand walk indices into output frame ids per stitching mode.

    mode 1: each index is one frame (reference: video_textures.py:48-129).
    mode 2: each index starts a block of ``stride`` frames
            (reference: video_textures.py:131-169).
    mode 3: each index is a segment row of the strided matrix; emits the last
            ``stride`` frames of its ``filter_size`` window
            (reference: video_textures.py:170-209).
    """
    if mode == 1:
        return np.asarray(indices)
    out = []
    if mode == 2:
        out.extend(range(indices[0], min(indices[0] + stride, num_frames)))
        for nxt in indices[1:]:
            out.extend(range(nxt, min(nxt + stride, num_frames)))
    else:
        out.extend(range(indices[0], indices[0] + filter_size))
        for nxt in indices[1:]:
            lo = nxt * stride + (filter_size - stride)
            hi = nxt * stride + filter_size
            out.extend(range(lo, min(hi, num_frames)))
    return np.asarray(out)
