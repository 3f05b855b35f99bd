"""Schödl anticipated-future-cost value iteration (D3 / "q_learning").

The reference sweeps rows bottom-up, recomputing the identical per-row-min
vector inside every row update — O(N^2) redundant work per sweep
(reference: baselines/classic_video_textures/q_learning.py:39-51, noted in
SURVEY.md as a bug not to copy). Because ``D3_old`` is frozen for the whole
sweep, the math is a Jacobi fixed-point iteration:

    mins[j]   = min_{k != j} D3_old[j, k]
    D3_new[i] = D3[i] + alpha * mins        for i in [1, N)   (row 0 untouched)

which is one masked row-min + one broadcast add per sweep — vectorized here
as a ``lax.while_loop`` whose body is pure VPU work. The fixed point (and the
reference's quirk of never updating row 0) is preserved exactly; convergence
is mean squared delta < eps (reference: q_learning.py:39,50).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .d1 import distance_to_transition_probs


@functools.partial(jax.jit, static_argnames=())
def anticipated_future_cost(d2: jnp.ndarray, p: float = 0.7,
                            alpha: float = 0.997, eps: float = 1e-2,
                            max_sweeps: int = 10_000) -> jnp.ndarray:
    """Converged D3 matrix.

    Args:
      d2: [N, N] smoothed distance matrix.
      p: future-cost exponent (D3 = D2**p).
      alpha: discount on the anticipated future cost.
      eps: stop when mean((new - old)^2) < eps.
      max_sweeps: hard bound for the while_loop (convergence is geometric).
    """
    d3_base = d2.astype(jnp.float32) ** p
    n = d3_base.shape[0]
    diag_inf = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, 0.0)
    row_update = (jnp.arange(n) >= 1)[:, None]  # reference never updates row 0

    def sweep(state):
        d3_old, _, it = state
        mins = jnp.min(d3_old + diag_inf, axis=1)
        d3_new = jnp.where(row_update, d3_base + alpha * mins[None, :], d3_base)
        delta = jnp.mean((d3_new - d3_old) ** 2)
        return d3_new, delta, it + 1

    def cont(state):
        _, delta, it = state
        return jnp.logical_and(delta > eps, it < max_sweeps)

    init = (d3_base, jnp.float32(jnp.inf), jnp.int32(0))
    d3, _, _ = jax.lax.while_loop(cont, sweep, init)
    return d3


@jax.jit
def threshold_rows(p: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Zero out entries below ``rowmax - threshold*rowmax`` per row
    (reference: q_learning.py:63-64)."""
    rowmax = p.max(axis=1, keepdims=True)
    return jnp.where(p < rowmax - threshold * rowmax, 0.0, p)


def compute_d3(d2: jnp.ndarray, sigma_factor: float, p: float = 0.7,
               alpha: float = 0.997, eps: float = 1e-2,
               thresholding: float = 0.75
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(D3, P3, P3_thresholded, sigma) — API parity with reference q_learning."""
    d3 = anticipated_future_cost(d2, p=p, alpha=alpha, eps=eps)
    p3, sigma = distance_to_transition_probs(d3, sigma_factor)
    p3_new = threshold_rows(p3, thresholding)
    return d3, p3, p3_new, sigma
