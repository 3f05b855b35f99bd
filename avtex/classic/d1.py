"""All-pairs frame distance (D1) on the MXU.

The reference materializes [N, N, H*W*C] repeated tensors and norms them
(reference: baselines/classic_video_textures/computeD1.py:47-96) — O(N^2 F)
memory. Here the distance matrix is computed in Gram form,
``D^2 = |a|^2 + |b|^2 - 2 a.b``, so the dominant cost is one [N, F] x [F, N]
matmul that XLA tiles onto the MXU; memory is O(N^2 + N F).

Semantics preserved exactly:
- RGB mode uses *unnormalized* flattened frames; feature modes L2-normalize
  per-row first (reference: computeD1.py:85-86 commented out for RGB,
  :113-114 applied for ResNet).
- sigma = sigma_factor * sum(D)/count_nonzero(D) (reference: computeD1.py:240-241).
- P = exp(-D/sigma), rows shifted up by one with the last row duplicated so
  that P[i][j] ~ sim(i+1, j), then row-normalized (reference: computeD1.py:242-245).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("normalize",))
def pairwise_l2(feats: jnp.ndarray, normalize: bool = False) -> jnp.ndarray:
    """[N, N] matrix of pairwise L2 distances between rows of [N, F] feats."""
    x = feats.reshape(feats.shape[0], -1).astype(jnp.float32)
    if normalize:
        x = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
    sq = jnp.sum(x * x, axis=1)
    gram = jax.lax.dot_general(
        x, x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = sq[:, None] + sq[None, :] - 2.0 * gram
    d2 = jnp.maximum(d2, 0.0)
    # Exact zeros on the diagonal (Gram form has rounding residue there).
    d2 = d2 * (1.0 - jnp.eye(x.shape[0], dtype=jnp.float32))
    return jnp.sqrt(d2)


@jax.jit
def distance_to_transition_probs(d: jnp.ndarray, sigma_factor: float
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(P, sigma): exp(-D/sigma) with the reference's shift + row-normalize."""
    nz = jnp.sum(d != 0.0).astype(jnp.float32)
    sigma = sigma_factor * d.sum() / jnp.maximum(nz, 1.0)
    p = jnp.exp(-d / sigma)
    # Shift rows up by one, duplicating the last row: P[i] <- P[i+1].
    p = jnp.concatenate([p[1:], p[-1:]], axis=0)
    p = p / p.sum(axis=1, keepdims=True)
    return p, sigma


def compute_d1(feats: jnp.ndarray, sigma_factor: float, normalize: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(D1, P1, sigma) — API parity with reference compute_D1.

    On TPU with a large feature dim the tiled Pallas kernel
    (avtex/ops/pairwise.py) replaces the XLA Gram form: it streams the
    feature axis through VMEM instead of materializing the full fp32 Gram
    operands (the analogue of the reference's `slow` tiling mode,
    computeD1.py:58-96 — chosen automatically instead of by flag).
    """
    import jax
    x = feats.reshape(feats.shape[0], -1)
    use_pallas = (jax.default_backend() == "tpu"
                  and x.shape[0] * x.shape[1] > 32_000_000)
    if use_pallas:
        from avtex.ops import pairwise_l2_pallas
        d1 = pairwise_l2_pallas(x, normalize=normalize)
    else:
        d1 = pairwise_l2(x, normalize=normalize)
    p1, sigma = distance_to_transition_probs(d1, sigma_factor)
    return d1, p1, sigma
