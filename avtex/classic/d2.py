"""Temporal smoothing of the distance matrix (D2).

The reference convolves D1 with a *diagonal* kernel of binomial weights via
a dense [fs, fs] conv2d (reference: baselines/classic_video_textures/
computeD2.py:21-52) — fs^2 multiplies per output, all but fs of them by zero.
Because the kernel is diagonal, the valid-mode strided conv collapses to a
sum of diagonally-shifted slices:

    D2[i, j] = sum_k c_k * D1[i*s + k, j*s + k]

which XLA fuses into fs strided adds — O(fs) work per output instead of
O(fs^2), no materialized kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .d1 import distance_to_transition_probs


def binomial_coeffs(filter_size: int) -> np.ndarray:
    """Binomial weights c_k = C(fs-1, k) / 2^(fs-1).

    Matches ``(np.poly1d([.5, .5]) ** (fs-1)).coeffs``
    (reference: computeD2.py:34).
    """
    c = np.array([1.0])
    for _ in range(filter_size - 1):
        c = np.convolve(c, [0.5, 0.5])
    return c


@functools.partial(jax.jit, static_argnames=("filter_size", "stride"))
def diagonal_filter_smooth(d1: jnp.ndarray, filter_size: int = 16,
                           stride: int = 1) -> jnp.ndarray:
    """Valid-mode strided conv of D1 with the diagonal binomial kernel."""
    n = d1.shape[0]
    out = (n - filter_size) // stride + 1
    coeffs = binomial_coeffs(filter_size)
    acc = jnp.zeros((out, out), dtype=jnp.float32)
    for k, c in enumerate(coeffs):
        block = jax.lax.slice(d1, (k, k), (k + (out - 1) * stride + 1,) * 2,
                              (stride, stride))
        acc = acc + jnp.float32(c) * block
    return acc


def compute_d2(d1: jnp.ndarray, sigma_factor: float, filter_size: int = 16,
               stride: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(D2, P2, sigma) — API parity with reference compute_D2."""
    d2 = diagonal_filter_smooth(d1, filter_size, stride)
    p2, sigma = distance_to_transition_probs(d2, sigma_factor)
    return d2, p2, sigma
