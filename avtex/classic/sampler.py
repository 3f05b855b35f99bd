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


@functools.partial(jax.jit, static_argnames=("num_steps", "advance",
                                              "n_real"))
def _walk_scan(p: jnp.ndarray, start: jnp.ndarray, rng: jax.Array,
               num_steps: int, advance: int = 0, n_real: int = 0
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked-uniform walk; carry is the ROW sampled from.

    advance=0: row follows the chosen index (modes 1/3). advance=k>0:
    row = min(chosen + k, n_real - 1) — the reference's mode-2 state
    update ``this_frame = min(next + stride, P.shape[0] - 1)``
    (video_textures.py:148-169); n_real is the matrix size BEFORE any
    bucket padding. Jumps compare against the row actually sampled from
    (``next != this_frame + 1``).
    """
    mask = p > 0.0

    def step(carry, key):
        cur = carry
        row = mask[cur]
        # Uniform over nonzero columns: argmax of uniform noise on the mask.
        noise = jax.random.uniform(key, (p.shape[1],))
        nxt = jnp.argmax(jnp.where(row, noise, -1.0))
        jump = nxt != cur + 1
        new_row = (jnp.minimum(nxt + advance, n_real - 1) if advance
                   else nxt)
        return new_row, (nxt, jump)

    keys = jax.random.split(rng, num_steps)
    row0 = jnp.minimum(start + advance, n_real - 1) if advance else start
    _, (idx, jumps) = jax.lax.scan(step, row0, keys)
    return jnp.concatenate([start[None], idx]), jumps


def sample_texture_walk(p: jnp.ndarray, start: int, num_steps: int,
                        rng: jax.Array, advance: int = 0
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
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
      advance: 0 = transition from the chosen index (modes 1/3);
        k > 0 = from min(chosen + k, N-1) — the reference's mode-2
        stride advance (see _walk_scan).

    Returns:
      (indices [num_steps+1], jump_flags [num_steps]) — jump when the chosen
      next index differs from the sampled-from row + 1.
    """
    import os

    p = jnp.asarray(p)
    n_real = p.shape[0]
    n_pad = (-p.shape[0]) % 128
    if n_pad:
        p = jnp.pad(p, ((0, n_pad), (0, n_pad)))
    steps_pad = -(-num_steps // 64) * 64
    statics = dict(num_steps=steps_pad, advance=advance, n_real=n_real)
    dyn = (p, jnp.asarray(start, jnp.int32), rng)
    if os.environ.get("AVTEX_WALK_AOT", "1") == "1":
        from avtex.utils.aot import cached_compile
        key = (f"classic-walk-v2-N{p.shape[0]}-steps{steps_pad}-{p.dtype}"
               f"-adv{advance}-nr{n_real}")
        try:
            exe = cached_compile(
                key,
                lambda: jax.jit(
                    _walk_scan,
                    static_argnames=("num_steps", "advance", "n_real"))
                .lower(*dyn, **statics).compile())
            idx, jumps = exe(*dyn)
        except Exception:
            idx, jumps = _walk_scan(*dyn, **statics)
    else:
        idx, jumps = _walk_scan(*dyn, **statics)
    return idx[:num_steps + 1], jumps[:num_steps]


def sample_texture_walk_host(p: np.ndarray, start: int, num_steps: int,
                             rng: np.random.Generator, advance: int = 0
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy mirror of the reference walk (uniform over nonzero columns).

    ``advance`` as in sample_texture_walk: mode 2 transitions from
    min(chosen + stride, N-1) (video_textures.py:148-169)."""
    n = len(p)
    cur = min(start + advance, n - 1) if advance else start
    idx = [start]
    jumps = []
    for _ in range(num_steps):
        choices = np.flatnonzero(p[cur])
        nxt = int(rng.choice(choices))
        jumps.append(nxt != cur + 1)
        idx.append(nxt)
        cur = min(nxt + advance, n - 1) if advance else nxt
    return np.asarray(idx), np.asarray(jumps)


def expand_walk_to_frames(indices: np.ndarray, mode: int, stride: int,
                          filter_size: int, num_frames: int) -> np.ndarray:
    """Expand walk indices into output frame ids per stitching mode.

    mode 1: each index is one frame (reference: video_textures.py:48-129).
    mode 2: each index starts a block of ``stride`` frames; pass
            ``num_frames`` = the TRANSITION-MATRIX size — the reference
            clips blocks to P.shape[0], not the raw frame count
            (video_textures.py:155-157).
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
